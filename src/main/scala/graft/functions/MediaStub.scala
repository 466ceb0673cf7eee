package graft.functions

/** Typed rows + deterministic STUB decoder for the multimodal column path.
  *
  * Real media decoding (image/audio/video codecs) is unavailable in this
  * offline container, so [[decode]] is a clearly-marked deterministic fake:
  * it derives plausible media dimensions from an md5 of the payload bytes.
  * Everything AROUND it is the real production plumbing — opaque `binary`
  * payload column, typed metadata row, per-partition batch iteration — and a
  * real codec drops in behind the same signature.
  *
  * The stub arithmetic is intentionally SQL-expressible (md5 → integer
  * fields) so the harness can oracle-check the full pipeline.
  */
object MediaStub {

  /** Opaque media payload: the schema a 100 TB multimodal table carries —
    * an id plus a binary blob column (never materialized as string).
    */
  final case class MediaInput(doc_id: Long, payload: Array[Byte])

  /** Typed decode output — the metadata struct a real decoder would emit. */
  final case class MediaFeatures(doc_id: Long, width: Long, height: Long, n_frames: Long)

  /** STUB — deterministic fake decode (see object scaladoc). Derives
    * width/height/frame-count from the payload's md5; replace with a real
    * codec call behind this exact signature.
    */
  def decode(in: MediaInput): MediaFeatures = {
    val h = Md5Seed.prefixLong(in.payload, 6)
    MediaFeatures(
      doc_id = in.doc_id,
      width = 160 + h % 480,
      height = 90 + (h / 7) % 270,
      n_frames = 1 + (h / 11) % 120
    )
  }
}
