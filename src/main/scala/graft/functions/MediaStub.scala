package graft.functions

/** Typed rows + the media decode boundary for the multimodal column path.
  *
  * No real corpus media ships in this offline container, so the PAYLOAD is
  * synthetic: [[synthesizeContainer]] wraps each row's bytes into a
  * STRUCTURALLY REAL (A)PNG container — 8-byte PNG signature, IHDR chunk
  * with big-endian width/height, an APNG `acTL` chunk carrying the frame
  * count, the original bytes as the data chunk, IEND, every chunk with a
  * real CRC-32 — whose header fields derive deterministically from an md5
  * of the original bytes (the [[Md5Seed]] cross-engine contract, so the
  * DuckDB oracle regenerates the same values arithmetically).
  *
  * [[decode]] is a REAL header parser, not a hash: it validates the
  * signature, walks the chunk stream (length-prefixed, big-endian),
  * verifies each chunk's CRC-32, requires the stream to END at IEND (no
  * trailing bytes — the fails-loudly contract), and extracts
  * width/height/frame-count from the IHDR/acTL fields. The IDAT payload
  * is a REAL zlib stream (stored-block DEFLATE + adler32) that decode
  * inflates with `java.util.zip.Inflater` — the adler32 is verified by
  * the inflater on finish — and censuses as a pixel byte-sum the oracle
  * regenerates arithmetically. The only remaining stub is that the
  * "pixels" are md5-derived bytes rather than an encoded image (declared
  * in FIXTURES.md); a full codec drops in behind the same `MediaInput ⇒
  * MediaFeatures` signature.
  */
object MediaStub {

  /** Opaque media payload: the schema a 100 TB multimodal table carries —
    * an id plus a binary blob column (never materialized as string).
    */
  final case class MediaInput(doc_id: Long, payload: Array[Byte])

  /** Typed decode output — the metadata struct a real decoder would emit,
    * plus the inflated-pixel byte-sum census (the cheapest whole-payload
    * proof that the zlib stream round-tripped).
    */
  final case class MediaFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      pix_sum: Long
  )

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t   = chunkType.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t)
    crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  /** The synthetic "pixel" payload: 64 md5-stream bytes (4 blocks × 16
    * digest bytes, seeded `payload ++ "|px<blk>"`) — byte-for-byte what
    * the DuckDB oracle regenerates as
    * `('0x' || substr(md5(text || '|px' || (i//16)), (i%16)*2+1, 2))`.
    */
  private[graft] def pixelBytes(payload: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 4).toArray.flatMap { blk =>
      md.reset()
      md.update(payload)
      md.update(s"|px$blk".getBytes("US-ASCII"))
      md.digest()
    }
  }

  /** A REAL zlib stream around `raw`: 0x78 0x01 header, one stored-block
    * DEFLATE frame (BFINAL=1, BTYPE=00, LEN/NLEN little-endian — RFC 1951
    * §3.2.4), big-endian adler32 trailer (RFC 1950). `Inflater` consumes
    * it like any compressed stream and checks the adler on finish.
    */
  private[graft] def zlibStored(raw: Array[Byte]): Array[Byte] = {
    require(raw.length <= 0xffff, "single stored block supports <= 65535 bytes")
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    Array[Byte](0x78, 0x01, 0x01,
      (raw.length & 0xff).toByte, ((raw.length >>> 8) & 0xff).toByte,
      (~raw.length & 0xff).toByte, ((~raw.length >>> 8) & 0xff).toByte) ++
      raw ++ be32(adler.getValue)
  }

  /** A REAL zlib stream around `raw` using one FIXED-HUFFMAN DEFLATE
    * block (RFC 1951 §3.2.6: BFINAL=1, BTYPE=01, every byte emitted as a
    * literal through the fixed literal/length code — 8-bit codes
    * 0x30+L for L ≤ 143, 9-bit codes 0x190+(L−144) above, 7-bit
    * end-of-block — header fields packed LSB-first, Huffman codes packed
    * MSB-first per §3.1.1), adler32 trailer. A literal-only fixed block
    * is fully legal DEFLATE; `Inflater` decodes it through its actual
    * Huffman path rather than the stored-block shortcut.
    */
  private[graft] def zlibFixedHuffman(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nb  = 0
    def put(bit: Int): Unit = {
      cur |= (bit & 1) << nb; nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def putLsb(v: Int, n: Int): Unit  = (0 until n).foreach(i => put((v >>> i) & 1))
    def putHuff(code: Int, n: Int): Unit = ((n - 1) to 0 by -1).foreach(i => put((code >>> i) & 1))
    putLsb(1, 1) // BFINAL
    putLsb(1, 2) // BTYPE = 01 (fixed Huffman)
    raw.foreach { b0 =>
      val l = b0 & 0xff
      if (l <= 143) putHuff(0x30 + l, 8) else putHuff(0x190 + (l - 144), 9)
    }
    putHuff(0, 7)          // end-of-block (symbol 256)
    if (nb > 0) out.write(cur) // zero-pad to the byte boundary
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    Array[Byte](0x78, 0x01) ++ out.toByteArray ++ be32(adler.getValue)
  }

  /** A REAL zlib stream around `raw` using one DYNAMIC-HUFFMAN DEFLATE
    * block (RFC 1951 §3.2.7, BTYPE=10 — the third and last block type):
    * a true frequency-built Huffman code over the literal alphabet
    * (+ end-of-block), its code lengths transmitted through the
    * 19-symbol code-length code in the spec's magic permutation order,
    * zero runs compressed with symbols 17/18 (3/7 extra bits), two
    * declared-but-unused length-1 distance codes forming a complete
    * distance tree. The code-length code itself is a balanced complete
    * canonical code (k = 2^L − n symbols at L−1, rest at L — Kraft sums
    * to exactly 1, depth ≤ 5 < the 3-bit-field limit of 7). `Inflater`
    * must parse BOTH transmitted trees to decode a single byte — the
    * full dynamic path, not the fixed-table shortcut.
    *
    * Literal-only (no LZ77 back-references) is fully legal DEFLATE; the
    * Huffman depth bound (15) cannot bind at this payload size (worst
    * case depth grows ~log_φ of total weight; weight = |raw| + 1 ≤ 65
    * here) and is asserted anyway.
    */
  private[graft] def zlibDynamicHuffman(raw: Array[Byte]): Array[Byte] = {
    // --- true Huffman lengths over the literal alphabet + EOB ---
    val freq = new Array[Long](257)
    raw.foreach(b => freq(b & 0xff) += 1)
    freq(256) = 1 // end-of-block
    final case class Node(w: Long, sym: Int, l: Node, r: Node)
    val ord = Ordering.by[Node, (Long, Int)](n => (n.w, n.sym))
    val pq  = scala.collection.mutable.PriorityQueue.empty[Node](ord.reverse)
    for (s <- 0 to 256 if freq(s) > 0) pq.enqueue(Node(freq(s), s, null, null))
    val litLen = new Array[Int](257)
    if (pq.size == 1) litLen(pq.head.sym) = 1 // degenerate single-symbol alphabet
    else {
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        pq.enqueue(Node(a.w + b.w, math.min(a.sym, b.sym), a, b))
      }
      def depths(n: Node, d: Int): Unit =
        if (n.l == null) litLen(n.sym) = math.max(d, 1)
        else { depths(n.l, d + 1); depths(n.r, d + 1) }
      depths(pq.dequeue(), 0)
    }
    require(litLen.forall(_ <= 15), "literal code depth exceeded 15 — payload contract broken")
    val distLen = Array(1, 1) // complete, never-used distance tree
    // --- canonical codes from lengths (RFC 1951 §3.2.2) ---
    def canonical(lens: Array[Int]): Array[Int] = {
      val maxL    = lens.max
      val blCount = new Array[Int](maxL + 1)
      lens.foreach(l => if (l > 0) blCount(l) += 1)
      val nextCode = new Array[Int](maxL + 2)
      var code     = 0
      for (l <- 1 to maxL) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code }
      lens.map { l =>
        if (l == 0) 0 else { val c = nextCode(l); nextCode(l) += 1; c }
      }
    }
    val litCode = canonical(litLen)
    // --- code-length-code symbol stream for litLen ++ distLen ---
    val allLens = litLen ++ distLen
    val clSyms  = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)] // (sym, extra, nbits)
    var i = 0
    while (i < allLens.length) {
      if (allLens(i) == 0) {
        var run = 0
        while (i + run < allLens.length && allLens(i + run) == 0) run += 1
        var left = run
        while (left >= 11) { val t = math.min(left, 138); clSyms += ((18, t - 11, 7)); left -= t }
        if (left >= 3) { clSyms += ((17, left - 3, 3)); left = 0 }
        while (left > 0) { clSyms += ((0, 0, 0)); left -= 1 }
        i += run
      } else { clSyms += ((allLens(i), 0, 0)); i += 1 }
    }
    // --- balanced complete code for the code-length alphabet ---
    val clUsed = clSyms.map(_._1).distinct.sorted
    val n      = clUsed.size
    val clLens = new Array[Int](19)
    if (n == 1) clLens(clUsed.head) = 1
    else {
      val bigL = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil(log2 n)
      val k    = (1 << bigL) - n                          // symbols that get length bigL-1
      clUsed.zipWithIndex.foreach { case (s, idx) =>
        clLens(s) = if (idx < k) bigL - 1 else bigL
      }
    }
    val clCode = canonical(clLens)
    // --- bit stream ---
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nb  = 0
    def put(bit: Int): Unit = {
      cur |= (bit & 1) << nb; nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def putLsb(v: Int, w: Int): Unit  = (0 until w).foreach(j => put((v >>> j) & 1))
    def putHuff(code0: Int, w: Int): Unit = ((w - 1) to 0 by -1).foreach(j => put((code0 >>> j) & 1))
    putLsb(1, 1) // BFINAL
    putLsb(2, 2) // BTYPE = 10 (dynamic)
    putLsb(0, 5) // HLIT: 257 literal/length codes (covers 0..256)
    putLsb(1, 5) // HDIST: 2 distance codes
    val clOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)
    val hclen   = math.max(4, clOrder.lastIndexWhere(s => clLens(s) > 0) + 1)
    putLsb(hclen - 4, 4)
    (0 until hclen).foreach(j => putLsb(clLens(clOrder(j)), 3))
    clSyms.foreach { case (sym, extra, ebits) =>
      putHuff(clCode(sym), clLens(sym))
      if (ebits > 0) putLsb(extra, ebits)
    }
    raw.foreach(b => putHuff(litCode(b & 0xff), litLen(b & 0xff)))
    putHuff(litCode(256), litLen(256)) // end of block
    if (nb > 0) out.write(cur)
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    Array[Byte](0x78, 0x01) ++ out.toByteArray ++ be32(adler.getValue)
  }

  /** SYNTHETIC-PAYLOAD step (declared in FIXTURES.md): wrap raw bytes in a
    * real (A)PNG container whose IHDR width/height and acTL frame count
    * derive from the md5 of the ORIGINAL bytes — the same arithmetic the
    * oracle regenerates. Bit depth 8 / color type 6 (RGBA), the original
    * bytes ride an `rAWd` private ancillary chunk, and the IDAT carries
    * the md5-derived [[pixelBytes]] as a genuine zlib stream — the
    * DEFLATE block type rotates on h mod 3 across stored
    * ([[zlibStored]]), fixed-Huffman ([[zlibFixedHuffman]]) and
    * dynamic-Huffman ([[zlibDynamicHuffman]]) frames, so ALL THREE
    * RFC 1951 block types run through the real `Inflater` on every
    * corpus.
    */
  def synthesizeContainer(in: MediaInput): MediaInput = {
    val h      = Md5Seed.prefixLong(in.payload, 6)
    val width  = 160 + h % 480
    val height = 90 + (h / 7) % 270
    val frames = 1 + (h / 11) % 120
    val ihdr   = be32(width) ++ be32(height) ++ Array[Byte](8, 6, 0, 0, 0)
    val actl   = be32(frames) ++ be32(0L) // num_frames, num_plays (APNG acTL)
    val px = pixelBytes(in.payload)
    val idat = (h % 3) match {
      case 0 => zlibStored(px)
      case 1 => zlibFixedHuffman(px)
      case _ => zlibDynamicHuffman(px)
    }
    val bytes = PngSignature ++
      chunk("IHDR", ihdr) ++
      chunk("acTL", actl) ++
      chunk("rAWd", in.payload) ++
      chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    MediaInput(in.doc_id, bytes)
  }

  /** REAL header parse (see object scaladoc): signature check → chunk walk
    * with per-chunk CRC-32 verification → big-endian field extraction →
    * a genuine `Inflater` pass over the IDAT zlib stream (stored-block
    * DEFLATE; the inflater validates the adler32 on finish) censused as
    * the pixel byte-sum. Malformed input FAILS LOUDLY (a silent fallback
    * would let corrupt media score as decoded at corpus scale): bad
    * signature, truncated or CRC-broken chunks, a corrupt zlib stream,
    * and bytes trailing IEND all throw. n_frames defaults to 1 when no
    * acTL chunk is present — the actual APNG semantic for a still PNG.
    */
  def decode(in: MediaInput): MediaFeatures = {
    val b = in.payload
    require(
      b.length >= 8 && PngSignature.indices.forall(i => b(i) == PngSignature(i)),
      s"doc ${in.doc_id}: not a PNG container (bad signature)"
    )
    var off      = 8
    var width    = -1L
    var height   = -1L
    var nFrames  = 1L
    var pixSum   = -1L
    var sawIend  = false
    while (!sawIend) {
      require(off + 8 <= b.length, s"doc ${in.doc_id}: truncated chunk header at $off")
      val len = readBe32(b, off)
      val t   = new String(b, off + 4, 4, "US-ASCII")
      require(off + 12 + len <= b.length, s"doc ${in.doc_id}: truncated $t chunk at $off")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len.toInt)
      require(
        crc.getValue == readBe32(b, off + 8 + len.toInt),
        s"doc ${in.doc_id}: CRC mismatch in $t chunk"
      )
      t match {
        case "IHDR" =>
          width = readBe32(b, off + 8)
          height = readBe32(b, off + 12)
        case "acTL" => nFrames = readBe32(b, off + 8)
        case "IDAT" =>
          // real inflate: the zlib wrapper's adler32 is checked by the
          // JDK inflater when the stream finishes — a corrupted trailer
          // (or body) surfaces as DataFormatException / !finished
          val inf = new java.util.zip.Inflater()
          inf.setInput(b, off + 8, len.toInt)
          val out = new Array[Byte](65536)
          var n   = 0
          try {
            var done = false
            while (!done) {
              val got = inf.inflate(out, n, out.length - n)
              require(
                got > 0 || inf.finished(),
                s"doc ${in.doc_id}: IDAT zlib stream stalled (truncated?)"
              )
              n += got
              done = inf.finished()
            }
          } catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"doc ${in.doc_id}: corrupt IDAT zlib stream: ${e.getMessage}")
          } finally inf.end()
          pixSum = 0L
          var k = 0
          while (k < n) { pixSum += (out(k) & 0xff); k += 1 }
        case "IEND" => sawIend = true
        case _      => () // ancillary chunks carry no decoded state
      }
      off += 12 + len.toInt
    }
    require(off == b.length, s"doc ${in.doc_id}: ${b.length - off} trailing bytes after IEND")
    require(width > 0 && height > 0, s"doc ${in.doc_id}: missing or invalid IHDR")
    require(pixSum >= 0, s"doc ${in.doc_id}: no IDAT chunk")
    MediaFeatures(in.doc_id, width, height, nFrames, pixSum)
  }

  /** Typed decode output for the video path: the ISO-BMFF movie-header
    * fields a container sniffer extracts before handing samples to a
    * codec, plus the raw-payload byte census proving the (large)size box
    * walk covered the whole stream.
    */
  final case class Mp4Features(
      doc_id: Long,
      version: Long,
      timescale: Long,
      duration: Long,
      duration_ms: Long,
      n_tracks: Long,
      payload_bytes: Long,
      codec: String,
      n_chunks: Long,
      chunk_span: Long
  )

  /** One ISO-BMFF box: 32-bit big-endian size (INCLUDING the 8-byte
    * header), 4-char type, payload. size=1 switches to the 64-bit
    * `largesize` form (header grows to 16), size=0 means "extends to the
    * end of the file" — both real format quirks ([ISO/IEC 14496-12 §4.2])
    * the walker must handle.
    */
  private def box(boxType: String, payload: Array[Byte], large: Boolean = false,
      toEof: Boolean = false): Array[Byte] = {
    val t = boxType.getBytes("US-ASCII")
    if (toEof) be32(0L) ++ t ++ payload
    else if (large)
      be32(1L) ++ t ++ be32(0L) ++ be32(16L + payload.length) ++ payload
    else be32(8L + payload.length) ++ t ++ payload
  }

  /** SYNTHETIC-PAYLOAD step, video face (declared in FIXTURES.md): a real
    * ISO-BMFF (MP4-family) container — `ftyp` (isom), `moov`>`mvhd` with
    * the VERSION-DEPENDENT field widths (v0 = 32-bit times/duration,
    * v1 = 64-bit; version = h mod 2 so both paths stay exercised), the
    * original bytes in a `rawd` box that takes the 64-bit `largesize`
    * form when h mod 3 = 0, and a trailing `free` box that uses the
    * size=0 "to end of file" form when h mod 5 = 0 — all header fields
    * md5-derived so the oracle regenerates them arithmetically.
    */
  def synthesizeMp4(in: MediaInput): MediaInput = {
    val h         = Md5Seed.prefixLong(in.payload, 6)
    val version   = h % 2
    val timescale = 600L * (1 + h % 8)
    val duration  = timescale * (1 + (h / 7) % 300) + (h / 11) % timescale
    val nTracks   = (h / 13) % 4 + 1
    val ctime     = h % 100000
    val mtime     = ctime + (h / 3) % 1000
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val matrix = Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(be32)
    val mvhd =
      if (version == 0)
        Array[Byte](0, 0, 0, 0) ++ be32(ctime) ++ be32(mtime) ++ be32(timescale) ++
          be32(duration) ++ be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++
          new Array[Byte](8) ++ matrix ++ new Array[Byte](24) ++ be32(nTracks + 1)
      else
        Array[Byte](1, 0, 0, 0) ++ be64(ctime) ++ be64(mtime) ++ be32(timescale) ++
          be64(duration) ++ be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++
          new Array[Byte](8) ++ matrix ++ new Array[Byte](24) ++ be32(nTracks + 1)
    val ftyp = "isom".getBytes("US-ASCII") ++ be32(512L) ++
      "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII")
    // trak > mdia > minf > stbl > (stsd + stco): the sample-description
    // entry carries a REAL codec fourcc, and the chunk-offset table
    // carries REAL absolute file offsets into the rawd payload — chunk i
    // starts at rawd_payload_start + i·(len div n_chunks), which requires
    // computing the moov subtree's own size first (exactly the layout
    // arithmetic a muxer does; ISO/IEC 14496-12 §8.5.2/§8.7.5).
    val codec    = Seq("avc1", "hev1", "mp4v", "av01")((h / 19 % 4).toInt)
    val nChunks  = (h / 17) % 8 + 1
    val stsdEntry = be32(16L) ++ codec.getBytes("US-ASCII") ++
      new Array[Byte](6) ++ Array[Byte](0, 1)
    val stsd    = box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1L) ++ stsdEntry)
    val rawdHdr  = if (h % 3 == 0) 16L else 8L
    val mvhdBox  = box("mvhd", mvhd)
    // moov = 8 + mvhd + trak; trak = 8 + mdia = 8+8 + minf = 8+8+8 + stbl;
    // stbl = 8 + stsd + stco with stco = 16 + 4·n
    val stblLen  = 8L + stsd.length + (16L + 4L * nChunks)
    val moovLen  = 8L + mvhdBox.length + (24L + stblLen)
    val rawdPayloadStart = 24L + moovLen + rawdHdr
    val step     = in.payload.length.toLong / nChunks
    val stco = box("stco",
      Array[Byte](0, 0, 0, 0) ++ be32(nChunks) ++
        (0L until nChunks).toArray.flatMap(i => be32(rawdPayloadStart + i * step)))
    val stbl = box("stbl", stsd ++ stco)
    val trak = box("trak", box("mdia", box("minf", stbl)))
    val moov = box("moov", mvhdBox ++ trak)
    assert(moov.length == moovLen, s"moov layout arithmetic drifted: ${moov.length} vs $moovLen")
    val bytes = box("ftyp", ftyp) ++
      moov ++
      box("rawd", in.payload, large = h % 3 == 0) ++
      box("free", Array[Byte](0, 0, 0, 0), toEof = h % 5 == 0)
    MediaInput(in.doc_id, bytes)
  }

  /** REAL ISO-BMFF box walk + movie-header parse: validates the `ftyp`
    * leader and brand, walks the top-level box stream handling BOTH size
    * quirks (size=1 → 64-bit largesize header; size=0 → box extends to
    * EOF and must be last), recurses into `moov`, parses `mvhd` with
    * version-dependent field widths, and censuses the `rawd` payload
    * bytes. Malformed input FAILS LOUDLY: truncated/undersized boxes, a
    * missing or duplicated mvhd, an unknown mvhd version, a box
    * overrunning its enclosing scope, or a walk that does not end exactly
    * at EOF. (A size=0 box consumes everything to scope end BY THE FORMAT
    * — trailing bytes after it are its payload, not an error.)
    */
  def decodeMp4(in: MediaInput): Mp4Features = {
    val b = in.payload
    require(
      b.length >= 16 && new String(b, 4, 4, "US-ASCII") == "ftyp" &&
        new String(b, 8, 4, "US-ASCII") == "isom",
      s"doc ${in.doc_id}: not an isom ISO-BMFF container"
    )
    def be64At(off: Int): Long = (readBe32(b, off) << 32) | readBe32(b, off + 4)
    var version   = -1L
    var timescale = -1L
    var duration  = -1L
    var nTracks   = -1L
    var payloadN  = -1L
    var sawMvhd   = false
    var codec     = ""
    var chunkOffs = Array.emptyLongArray
    var rawdStart = -1L
    def parseMvhd(off: Int, len: Long): Unit = {
      require(!sawMvhd, s"doc ${in.doc_id}: duplicate mvhd")
      sawMvhd = true
      version = b(off) & 0xffL
      version match {
        case 0L =>
          require(len >= 100, s"doc ${in.doc_id}: short mvhd v0")
          timescale = readBe32(b, off + 12)
          duration = readBe32(b, off + 16)
          nTracks = readBe32(b, off + 96) - 1
        case 1L =>
          require(len >= 112, s"doc ${in.doc_id}: short mvhd v1")
          timescale = readBe32(b, off + 20)
          duration = be64At(off + 24)
          nTracks = readBe32(b, off + 108) - 1
        case v => throw new IllegalArgumentException(s"doc ${in.doc_id}: unknown mvhd version $v")
      }
    }
    // walk boxes in [from, to); recurse into containers we understand
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var off = from
      while (off < to) {
        require(off + 8 <= to, s"doc ${in.doc_id}: truncated box header at $off")
        val size32 = readBe32(b, off)
        val t      = new String(b, off + 4, 4, "US-ASCII")
        val (hdr, size): (Int, Long) = size32 match {
          case 0L => (8, (to - off).toLong) // to end of enclosing scope — must be last
          case 1L =>
            require(off + 16 <= to, s"doc ${in.doc_id}: truncated largesize header")
            (16, be64At(off + 8))
          case s => (8, s)
        }
        require(size >= hdr, s"doc ${in.doc_id}: box $t size $size < header")
        require(off + size <= to, s"doc ${in.doc_id}: box $t overruns its scope")
        t match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(off + hdr, (off + size).toInt, depth + 1)
          case "mvhd" => parseMvhd(off + hdr, size - hdr)
          case "stsd" =>
            // sample description (§8.5.2): ver/flags, entry_count, then
            // entries each led by (size, fourcc) — the codec identity
            require(size - hdr >= 16, s"doc ${in.doc_id}: short stsd")
            require(codec.isEmpty, s"doc ${in.doc_id}: duplicate stsd")
            val n = readBe32(b, off + hdr + 4)
            require(n == 1, s"doc ${in.doc_id}: expected one sample entry, got $n")
            val esz = readBe32(b, off + hdr + 8)
            require(esz >= 16 && hdr + 8 + esz <= size,
              s"doc ${in.doc_id}: stsd entry overruns its box")
            codec = new String(b, off + hdr + 12, 4, "US-ASCII")
          case "stco" =>
            // chunk-offset table (§8.7.5): ver/flags, entry_count, then
            // 32-bit ABSOLUTE file offsets — validated against the rawd
            // extent once the walk completes
            require(chunkOffs.isEmpty, s"doc ${in.doc_id}: duplicate stco")
            require(size - hdr >= 8, s"doc ${in.doc_id}: short stco")
            val n = readBe32(b, off + hdr + 4)
            require(size - hdr == 8 + 4 * n,
              s"doc ${in.doc_id}: stco declares $n entries but carries ${(size - hdr - 8) / 4}")
            chunkOffs = Array.tabulate(n.toInt)(i => readBe32(b, off + hdr + 8 + 4 * i))
          case "rawd" =>
            payloadN = size - hdr
            rawdStart = off + hdr
          case _ => () // ftyp/free/unknown: validated and skipped
        }
        off += size.toInt
      }
      require(off == to, s"doc ${in.doc_id}: box walk overran scope end")
    }
    walk(0, b.length, 0)
    require(sawMvhd, s"doc ${in.doc_id}: no mvhd box")
    require(payloadN >= 0, s"doc ${in.doc_id}: no rawd box")
    require(timescale > 0, s"doc ${in.doc_id}: invalid timescale")
    require(codec.nonEmpty, s"doc ${in.doc_id}: no stsd box")
    require(chunkOffs.nonEmpty, s"doc ${in.doc_id}: no stco box")
    // every chunk offset must land inside the media payload it indexes —
    // an out-of-range stco entry is the corrupt-container case a demuxer
    // must refuse (it would read another box's bytes as samples)
    chunkOffs.foreach { o =>
      require(o >= rawdStart && o < rawdStart + math.max(payloadN, 1L),
        s"doc ${in.doc_id}: stco offset $o outside rawd [$rawdStart, ${rawdStart + payloadN})")
    }
    Mp4Features(
      in.doc_id,
      version,
      timescale,
      duration,
      1000L * duration / timescale,
      nTracks,
      payloadN,
      codec,
      chunkOffs.length.toLong,
      chunkOffs.last - chunkOffs.head
    )
  }

  /** Typed decode output for the audio path: header fields plus the
    * 64-sample-window energy profile summary a VAD/segmentation stage
    * reads (full windows only — the x24 contract).
    */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      n_windows: Long,
      peak_window: Long,
      peak_energy: Long
  )

  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Long): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def readLe16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)

  /** SYNTHETIC-PAYLOAD step, audio face (declared in FIXTURES.md): a real
    * RIFF/WAVE container — RIFF header, PCM `fmt ` chunk (mono, 16-bit,
    * little-endian throughout, the actual WAV wire format), `data` chunk —
    * holding n = 256 + (h mod 256) samples s_k = ((h + 2654435761·k) mod
    * 65536) − 32768 at rate 8000·(1 + (h div 5) mod 6) Hz, all derived
    * from the md5 of the original bytes so the oracle regenerates the
    * exact waveform arithmetically.
    */
  def synthesizeWav(in: MediaInput): MediaInput = {
    val h        = Md5Seed.prefixLong(in.payload, 6)
    val n        = 256 + (h % 256).toInt
    val rate     = 8000L * (1 + (h / 5) % 6)
    val samples  = Array.tabulate(n)(k => ((h + 2654435761L * k) % 65536L - 32768L).toShort)
    val dataLen  = 2L * n
    val fmt = le16(1L) ++ le16(1L) ++ le32(rate) ++ le32(rate * 2) ++ le16(2L) ++ le16(16L)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++
      samples.flatMap(s => le16(s & 0xffffL))
    MediaInput(in.doc_id, "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body)
  }

  /** REAL RIFF/WAVE parse + PCM16 energy segmentation: validates the
    * RIFF/WAVE magic, walks the little-endian chunk stream, reads the PCM
    * format fields, decodes the 16-bit signed samples, and computes the
    * per-64-sample-window energy Σs² with the (peak window, peak energy)
    * argmax (ties → lowest window index). Malformed audio FAILS LOUDLY —
    * the m2 decode-boundary discipline on the audio modality.
    */
  def decodeWav(in: MediaInput): AudioFeatures = {
    val b = in.payload
    require(
      b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "WAVE",
      s"doc ${in.doc_id}: not a RIFF/WAVE container"
    )
    require(readLe32(b, 4) == b.length - 8L, s"doc ${in.doc_id}: RIFF size mismatch")
    var off        = 12
    var rate       = -1L
    var bits       = -1L
    var channels   = -1L
    var dataOff    = -1
    var dataLen    = -1L
    while (off + 8 <= b.length) {
      val t   = new String(b, off, 4, "US-ASCII")
      val len = readLe32(b, off + 4)
      require(off + 8 + len <= b.length, s"doc ${in.doc_id}: truncated $t chunk")
      t match {
        case "fmt " =>
          require(readLe16(b, off + 8) == 1L, s"doc ${in.doc_id}: not PCM")
          channels = readLe16(b, off + 10)
          rate = readLe32(b, off + 12)
          bits = readLe16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _      => ()
      }
      // RIFF pads odd-sized chunks to even offsets (the pad byte is not
      // counted in the chunk length) — a real WAV with an odd ancillary
      // chunk misparses without this
      off += 8 + len.toInt + (len % 2).toInt
    }
    require(off == b.length, s"doc ${in.doc_id}: ${b.length - off} trailing bytes in RIFF")
    require(rate > 0 && bits == 16 && channels == 1, s"doc ${in.doc_id}: missing/unsupported fmt")
    require(dataOff >= 0, s"doc ${in.doc_id}: no data chunk")
    val n = (dataLen / 2).toInt
    var w          = 0
    var peakW      = -1L
    var peakE      = -1L
    val nWindows   = n / 64
    while (w < nWindows) {
      var e = 0L
      var k = w * 64
      val end = k + 64
      while (k < end) {
        val s = ((b(dataOff + 2 * k) & 0xff) | (b(dataOff + 2 * k + 1) << 8)).toShort.toLong
        e += s * s
        k += 1
      }
      if (e > peakE) { peakE = e; peakW = w.toLong }
      w += 1
    }
    AudioFeatures(in.doc_id, rate, n.toLong, nWindows.toLong, peakW, peakE)
  }
}
