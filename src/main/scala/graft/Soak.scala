package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak harness: the plan-shape claims ("this would hold at 100 TB")
  * rest on reading `.explain` output; this main produces MEASURED evidence.
  * It replicates the sf0.1 tables N× (default 8) into a temp dir with
  * per-replica key offsets — cardinalities scale like a larger scale
  * factor, instead of the naive self-union that multiplies per-key row
  * counts and so distorts group sizes — then times the most expensive
  * queries at 1× and N× and reports the growth ratio per query.
  *
  * Scaling rules (TPC-H's own scaling model):
  *   - region/nation are fixed dimensions — copied once, never replicated;
  *   - every other table's key columns get `+ replica·10⁹` so replicas
  *     join among themselves and never collide (all harness keys ≪ 10⁹),
  *     with FK columns offset consistently with their parent PKs;
  *   - document text is salted PER WORD with the replica id, so replica
  *     shingle sets are pairwise disjoint: near-dup candidate density stays
  *     CONSTANT across scale and the d-family soak measures engine scaling,
  *     not corpus-semantics scaling. (The r8 prefix-only salt left long
  *     documents near-identical under MinHash — every doc gained N−1
  *     cross-replica siblings and candidate pairs grew quadratically in N,
  *     which the r9 verdict flagged as a harness artifact.);
  *   - event timestamps are left as-is: N× event density in the same time
  *     range, which is how a busier system scales.
  *
  * Pass/fail: a query FAILS the soak if wall-time grows worse than
  * `N × slack` (slack 1.5 — generous because the 1× run is fixed-overhead
  * dominated at sf0.1), or if the N× physical plan picks up a
  * BroadcastNestedLoopJoin or CartesianProduct the 1× plan didn't have
  * (the two node types that mean "a join lost its key"). Queries with
  * per-iteration fixed overhead (g2c) or overhead-dominated 1× runs are
  * expected to grow SUBlinearly — the bound is one-sided by design.
  *
  * Timing is two interleaved passes, per-query min (Bench's contention
  * defense). Output: a markdown table on stdout, also written to SOAK.md.
  *
  * Usage: `sbt "runMain graft.Soak [N]"` (env SPARK_GRAFT_SF_DIR overrides
  * the 1× source, default /root/testdata/sf0.1).
  */
object Soak {

  private val Off = 1000000000L

  /** Per-table key columns to offset per replica. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  /** The soak set: the most expensive queries per the round-5 bench, i.e.
    * the ones whose scaling behavior dominates total cost.
    */
  private val soakQueries = Seq(
    "g2c_community_hierarchy",
    "g6_triangles",
    "g7_modularity",
    "g8_refined_modularity",
    "g9_pagerank",
    "g10_kcore",
    "g11_neighbor_jaccard",
    "g12_bfs_hops",
    "g13_personalized_pagerank",
    // r8: the frontier-truncated PPR variant (the ratio drop vs g13 is the
    // point) and the fixed-point refinement (iterative, community-sized)
    "g13b_ppr_truncated",
    "g8b_refined_fixed_point",
    "d10_minhash_estimate",
    "d11_cluster_survivors",
    "pl5_tracks",
    "d4_ngram_jaccard",
    "d7_dedup_clusters",
    "pl8_vector_ingest",
    "d2_verified_pairs",
    // r13: the raw band-join candidate query itself (its census was always
    // in SOAK.md; the 256× tranche times it as a first-class row too)
    "d1_minhash_candidates",
    "g1b_degree_stats",
    "pl7_article_merge",
    "x9_tfidf_topk",
    "e4_rolling_window",
    // round-7 curation family: the corpus-wide shuffle (c3), the
    // broadcast-probe (c5), and the double-aggregation scorer (c9)
    "c3_substring_dedup",
    "c5_bloom_prune",
    "c9_importance_weights",
    "c1_sequence_pack",
    // the asymmetric index-probe dedup and the cross-source sketch merge
    "d13_incremental_neardup",
    "x13_hll_union",
    // round-8 corpus/event-scale additions: content-defined chunking
    // (per-doc rolling hash), corpus-level line dedup (line-hash shuffle),
    // and the global-disorder spine (two-level prefix max over events).
    // g15/g8c are excluded on purpose: they run on the fixed nation
    // dimension, which the soak never replicates.
    "c15_cdc_chunks",
    "c16_line_dedup",
    "e12_global_disorder",
    // round-8 second wave: the dedup-consistent split (CC + leak audit),
    // the hub-capped projection (the bounded self-join), the gram-novelty
    // join, the manifest-pruned scan (write + prune + read), and the
    // end-to-end funnel
    "d14_cluster_safe_split",
    "g16_cooccurrence_projection",
    "x16_novelty_rate",
    "s28_manifest_pruned_scan",
    "pl9_corpus_funnel",
    // round-10 additions heavy enough to earn a soak row: the containment
    // anchor-join (rare-shingle postings), the truss peel (2× the g6 wedge
    // join, graded at its m^1.5 exponent like g6), and the binary
    // block-fingerprint inverted-index join
    "d16_containment",
    "g17_ktruss",
    "m9_payload_block_dedup",
    "g18_clustering_coeff",
    // round-11 additions with a candidate-join at their core: the banding
    // recall audit (signatures over its own graded corpus) and the
    // perceptual-hash band-bucket join
    "d18_lsh_recall",
    "m10_phash_neardup",
    // round-13 retrieval/tokenizer rungs: the posting-probe scan (x26 —
    // the per-word replica salt leaves only the unsalted replica's
    // postings matching the fixed query terms, so the probe side stays
    // constant while the scan grows N×, exactly the inverted-probe shape
    // claim), the corpus-wide bigram shuffles (x27 PMI; x29 weighted
    // TextRank over N disjoint replica subgraphs — salted words never
    // co-occur across replicas, so the graph is N disjoint copies and the
    // rank passes must scale in edges), and the vocab-keyed BPE pair
    // count (x28 — vocabulary itself grows N× under the salt)
    "x26_bm25_topk",
    "x27_pmi_collocations",
    "x28_bpe_merge_step",
    "x29_textrank",
    // round-15: the r14/r15 additions earn their replica rungs. Replica
    // semantics per family: documents are word-salted per replica (grams/
    // vocab/LM tables grow N×, cross-replica gram collisions impossible);
    // lineitem keys are offset (graph replicas are disjoint subgraphs);
    // embeddings replicate as IDENTICAL vectors with offset ids — which
    // makes d21's duplicate graph grow N² BY CONSTRUCTION (every vector
    // gains N−1 true identical copies; SemDeDup on an N-duplicated corpus
    // genuinely has N² dup pairs to find), so d21 carries exp = 2 and a
    // small-N rung rather than a pretend-linear bar. s32 is excluded: its
    // staged atomic swap WRITES into the dataset dir, and soak replica
    // dirs are reused across invocations (the census-read-back makes a
    // second run grade a mutated snapshot).
    "c28_repeated_spans",
    "c29_dsir_importance",
    "a30_neyman_allocation",
    "a31_classifier_auc",
    "g21_hits",
    "g22_deepwalk_corpus",
    "o11_consistent_ring",
    "x31_bpe_apply",
    "x32_prf_expansion",
    "x33_stupid_backoff",
    "s33_bloom_skipping",
    "s35_counting_bloom",
    "s19i_ivfadc_rerank",
    "d21_semdedup",
    // r16: d22 and x34 get their advised replica rungs. d22 shares d21's
    // identical-copy embedding quadratic (every bucket's occupancy grows
    // N×, candidate pairs N² by construction) — exp = 2 with the candidate
    // census carried in-output; x34's anchors and planted positives live
    // only in replica 0 (doc_id 0..19 / −1..−20), so the probe side is
    // CONSTANT while the gram corpus grows N× — the linear bar applies.
    "d22_multiprobe_lsh",
    "x34_hard_negatives",
    // r16 additions with real replica-scaling work: x36's 16-step pair
    // counts and x37's piece inventory + per-word DP are vocabulary-sized,
    // and the per-replica word salt grows the vocabulary N x — the linear
    // bar applies (x28/x31's argument, deeper recurrences)
    "x36_bpe_schedule",
    "x37_unigram_viterbi",
    // r16: the SemDeDup PRODUCTION configuration — k scales with the
    // replica factor so cluster occupancy stays ~constant and Σ occ² is
    // LINEAR in the corpus (the paper's whole point; d21's fixed-k rung
    // above prices the harness configuration's declared N²). Resolved by
    // `queryFor` below: k = 8 on the 1× side, k = 8·N on the replica.
    "d21_semdedup_scaledk",
    // the IVF-routed assignment at the same constant-occupancy scaling:
    // k = 8N fine seeds, c = 4*sqrt(N) coarse cells, so per-vector
    // assignment work is c + k/c = Theta(sqrt(k)) instead of k — the cell
    // that prices what the brute-force scaled-k rung pays in assignment
    "d21b_semdedup_ivf_scaledk",
    // r16 second wave: g23's per-pass frontier joins probe the 16× edge
    // table (the pivot count stays 8 — the landmark bound — so the linear
    // bar prices the edge-scan growth); x38's sketch stays FIXED at 4×1024
    // cells under a 16× token stream (the register build is the linear
    // part); x39 is the narrow per-row map — 16× rows, zero shuffle
    "g23_sampled_betweenness",
    "x38_countmin_hitters",
    "x39_jl_projection",
    // r16 third wave: e20's corpus-sized work is ONE (user, day) distinct
    // (events replicate with offset user ids — 16× users, same day span);
    // x41 is the zero-shuffle per-row HOF scan — both linear-bar queries
    "e20_retention_cohorts",
    "x41_texttiling",
    // g24 re-pays the Memo-shared pivot BFS under the soak's per-cell
    // Memo.clearAll — so its rung prices the BFS + aggregate, same linear
    // class as g23's
    "g24_eccentricity",
    // r17: a33's corpus-sized work is c23's grouped pair construction
    // (prompt groups grow N× under the doc_id offset; the MM passes run
    // on the fixed 8-policy table either way); m12 is the zero-shuffle
    // per-row synthesize+parse byte crunch (m2's class) — both linear
    "a33_bradley_terry",
    "m12_wav_energy",
    // x42: zero-shuffle bounded-tail HOF scan + the planted-union branch —
    // x41's linear class
    "x42_loop_detector",
    // r18: s19j's corpus-sized work is the kNN-graph build — 6 band
    // equi-joins with a 256-per-bucket occupancy cap, so pair count (and
    // the rung) grows linearly once buckets saturate; the beam itself is
    // 5 bounded 72-id passes at any corpus size
    "s19j_graph_beam",
    // x43's corpus-sized work is the bpeVocab0 word count + the piece
    // count aggregate; the DP is row-local over the (replica-offset-fixed)
    // vocabulary, so the rung prices the two linear aggregates
    "x43_unigram_em_prune",
    // x44 is two gram-keyed aggregates + a doc-keyed reassembly (d6's
    // linear class); m13 is the zero-shuffle per-row synthesize+box-walk
    // byte crunch (m2/m12's class)
    "x44_self_bleu",
    "m13_mp4_meta",
    // s19l re-pays BOTH banded graph builds under the soak's per-cell
    // Memo.clearAll (full + the 1-in-8 coarse layer — same capped-pair
    // linear class as s19j); x45 is one corpus explode + a vocab-keyed
    // join over the replica-fixed vocabulary
    "s19l_hnsw_layers",
    "x45_tokenizer_fertility",
    // r19: s19m's corpus-sized work is the BASE graph build (s19j's capped
    // linear class); the probe itself scales with the BATCH (the 1-in-16
    // slice — so the rung also prices the batch dimension growing N×),
    // ≤ bands·|Δ|·cap pairs, and both beams stay bounded 72-id passes
    "s19m_graph_insert",
    // s19n shares s19j's memoized graph in Bench but re-pays the build
    // under the soak's per-cell clearAll (same capped-pair linear class);
    // the 15-pass sweep itself is scale-constant bounded frames
    "s19n_operating_curve",
    // s19o = 2x s19j's bounded beams over the same memoized graph (the
    // soak re-pays the build per cell, same capped-pair linear class)
    "s19o_multi_entry"
  )

  private[graft] def buildScaled(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    val all = Seq("region", "nation") ++ keyCols.keys
    all.foreach { t =>
      val base = Engine.table(spark, src, t)
      val scaled =
        if (!keyCols.contains(t)) base
        else
          (0 until n)
            .map { i =>
              val off = Off * i
              val shifted = keyCols(t).foldLeft(base) { (df, k) =>
                df.withColumn(k, col(k) + lit(off))
              }
              if (t == "documents" && i > 0)
                shifted.withColumn(
                  "text",
                  concat_ws(
                    " ",
                    transform(split(col("text"), " "), w => concat(w, lit(s"_r$i")))
                  )
                )
              else shifted
            }
            .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // Scale marker: prebuilt replicas are consumed by later Soak runs whose
    // CLI scale argument sets every ratio denominator and pass bar — a
    // replica built at a different N would silently grade against the wrong
    // bar (r11 advice). The marker makes the mismatch fail fast instead.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out, ScaleMarker), s"$n\n")
  }

  private val ScaleMarker = "_SCALE"

  /** Fail fast when a prebuilt replica's recorded scale disagrees with the
    * requested one (or carries no marker at all — a pre-r12 build).
    */
  private def validateScale(dir: String, n: Int): Unit = {
    val p = java.nio.file.Paths.get(dir, ScaleMarker)
    require(
      java.nio.file.Files.exists(p),
      s"prebuilt replica $dir has no $ScaleMarker marker — rebuild it with graft.tools.ScaleBuild"
    )
    val recorded = java.nio.file.Files.readString(p).trim.toInt
    require(
      recorded == n,
      s"prebuilt replica $dir was built at ${recorded}x but this soak was invoked at ${n}x — " +
        "every ratio and pass bar would use the wrong denominator"
    )
  }

  /** Soak queries whose RETURNED frame is itself a Memo-cached checkpoint
    * (as opposed to consuming one): their census must bypass the memo or it
    * walks a scan with no joins (r10 advice).
    */
  private val directMemo: Set[String] =
    Set("d2_verified_pairs", "d7_dedup_clusters", "pl7_article_merge")

  /** Per-query algorithmic cost exponent: the pass bar is N^exp × slack.
    * Default 1.0 (work ~ rows). Triangle counting is the one soak query
    * whose WORK is super-linear by design: wedge checks grow ~ m^1.5
    * under the (degree, id)-orientation arboricity bound (out-degree ≤
    * ~√m), so at N× edges the fair bar is N^1.5 — holding it to the
    * linear bar would flag the algorithm's own complexity class, not a
    * plan regression (r7's verdict already reads g6's 16× growth as "the
    * expected super-linear-in-edges wedge growth").
    */
  private val costExponent: Map[String, Double] =
    Map(
      "g6_triangles" -> 1.5,
      // same wedge-join work class as g6, run twice (the g16 substrate's
      // hub cap bounds the constant, not the exponent)
      "g17_ktruss" -> 1.5,
      "g18_clustering_coeff" -> 1.5,
      // identical-copy embedding replication: every vector gains N−1 true
      // duplicates, so the within-cluster pair set (and the dup graph the
      // query must REPORT) is N² — quadratic work is the correct answer,
      // not a regression; production keeps occupancy flat by scaling k∝n
      // (the SemDeDup paper's design), which replication cannot model
      "d21_semdedup" -> 2.0,
      // same identical-copy embedding replication argument as d21: every
      // probe bucket's occupancy grows N×, so candidates (and the true
      // graded pairs the query must report) grow N²
      "d22_multiprobe_lsh" -> 2.0
    ).withDefaultValue(1.0)

  /** Physical-plan join-node census — the soak's plan-flip detector.
    * Counts per node type, because some plans carry a BENIGN
    * BroadcastNestedLoopJoin at every scale (attaching a single-row scalar
    * aggregate via broadcast crossJoin — x9's corpus count, g7's modularity
    * scalars — is the canonical Spark idiom and is O(|rows|·1)); what the
    * soak must catch is a node type whose count GROWS at N×, i.e. a join
    * that lost its key when the data got bigger.
    */
  private def nodeCensus(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString()
    Seq("BroadcastNestedLoopJoin", "CartesianProduct")
      .map(n => n -> plan.sliding(n.length).count(_ == n))
      .toMap
  }

  def main(args: Array[String]): Unit = {
    val n   = args.headOption.map(_.toInt).getOrElse(8)
    // SPARK_GRAFT_SOAK_ONLY=q1,q2 re-soaks a subset (the iteration loop for
    // a targeted fix); filtered runs report to SOAK_DELTA.md so the full
    // run's SOAK.md table is never clobbered by a partial one.
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY").map(_.split(",").map(_.trim).toSet)
    val soakQueries = only match {
      case Some(qs) => Soak.soakQueries.filter(qs.contains)
      case None     => Soak.soakQueries
    }
    val reportFile = if (only.isDefined) "SOAK_DELTA.md" else "SOAK.md"
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_SOAK_DIR points at a PREBUILT N× replica (ScaleBuild's
    // output): the build step is skipped and the dir is kept afterwards —
    // the iteration loop for multi-invocation deep-soak campaigns where
    // rebuilding the replica per run would dominate wall time.
    val prebuilt = sys.env.get("SPARK_GRAFT_SOAK_DIR")
    val out = prebuilt.getOrElse(java.nio.file.Files.createTempDirectory("graft_soak").toString)
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (prebuilt.isEmpty) {
      println(s"[soak] building ${n}x replica of $src at $out")
      buildScaled(spark, src, out, n)
    } else {
      validateScale(out, n)
      println(s"[soak] using prebuilt ${n}x replica at $out")
    }

    // Scale-aware cells: names resolved here instead of SparkEntry carry a
    // knob that must move WITH the replica factor (d21's k — constant
    // occupancy is the configuration the SemDeDup paper actually runs).
    def queryFor(name: String, dir: String): DataFrame =
      if (name == "d21_semdedup_scaledk")
        graft.queries.Dedup.semDedup(spark, dir, k = if (dir == src) 8 else 8 * n)
      else if (name == "d21b_semdedup_ivf_scaledk") {
        val (kk, cc) =
          if (dir == src) (16, 4)
          else (8 * n, math.max(4, (4 * math.sqrt(n.toDouble)).toInt))
        graft.queries.Dedup.semDedupIvf(spark, dir, k = kk, c = cc)
      } else SparkEntry.queries(name)(spark, dir)

    def timeOnce(name: String, dir: String): Double = {
      // Cross-query memoization (Memo) must not leak into the measurement:
      // without this clear, the SECOND soak pass over a memoized query (d2,
      // d7, the co-supply/g8c substrates, pl2/pl7) times a checkpoint READ,
      // and the min-of-passes records engine cost that isn't there (the r10
      // advice flagged SOAK_DELTA's d2 at 0.05 s). Clearing before every
      // timed cell makes each measurement the full un-memoized compute;
      // dropping the strong refs also lets the ContextCleaner reclaim the
      // previous cell's checkpoint blocks, which is what the System.gc()
      // below relies on.
      Memo.clearAll()
      val t0 = System.nanoTime()
      queryFor(name, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      // Block hygiene between measurements: iterative queries leave their
      // localCheckpoint blocks pinned until the ContextCleaner sees the
      // RDDs garbage-collected — at 16× those are multi-hundred-MB blocks
      // that squeeze the MemoryStore for the NEXT query (measured: a
      // neighboring query's 16× time tripled from spill pressure). One GC
      // after each measurement releases them; the pause is outside the
      // timed window.
      System.gc()
      Thread.sleep(100)
      t
    }
    // two interleaved passes over (query × scale), per-cell min
    def pass(): Map[(String, String), Double] =
      (for { q <- soakQueries; dir <- Seq(src, out) } yield (q, dir) -> timeOnce(q, dir)).toMap
    val p1 = pass()
    val p2 = pass()
    val best = p1.map { case (k, v) => k -> math.min(v, p2(k)) }

    val slack = 1.5
    val rows = soakQueries.map { q =>
      val t1     = best((q, src))
      val tn     = best((q, out))
      val ratio  = tn / t1
      val bar    = math.pow(n.toDouble, costExponent(q)) * slack
      // Census: a DIRECTLY-memoized query's own frame is a checkpoint scan
      // (zero joins — the r10 advice's census blind spot), so those queries
      // census under Memo.bypass, which makes the outermost cached call
      // return its RAW compute plan and the census walk the actual join
      // tree. Queries that merely CONSUME a memoized substrate keep the
      // normal path: their own joins sit above the truncated substrate in
      // the plan either way, and bypassing them would rebuild the substrate
      // raw under every iterative pass just to print a plan.
      def census(dir: String): Map[String, Int] =
        if (directMemo(q)) Memo.bypass(nodeCensus(queryFor(q, dir)))
        else nodeCensus(queryFor(q, dir))
      val before = census(src)
      val after  = census(out)
      val flips  = after.collect { case (node, c) if c > before(node) => node }.toSeq
      val ok     = ratio <= bar && flips.isEmpty
      (q, t1, tn, ratio, bar, flips, ok)
    }

    val md = new StringBuilder
    md.append(s"# SOAK — $src vs ${n}x (key-offset replicas)\n\n")
    md.append(s"Pass bar: ratio <= N^exp x $slack (exp = the query's algorithmic cost exponent,\n")
    md.append(s"1.0 except where the WORK is super-linear by design — g6's wedge checks ~ m^1.5\n")
    md.append(s"under the arboricity bound); no BNLJ/CartesianProduct node count growing at ${n}x\n")
    md.append("(a constant count is benign: single-row scalar-aggregate broadcasts plan as 1-row BNLJ by design).\n")
    md.append("Timing = min of two interleaved passes (Bench's contention defense).\n\n")
    md.append("| query | t(1x) s | t(" + n + "x) s | ratio | bar | plan flips | verdict |\n")
    md.append("|---|---|---|---|---|---|---|\n")
    rows.foreach { case (q, t1, tn, r, bar, flips, ok) =>
      md.append(
        f"| $q | $t1%.2f | $tn%.2f | $r%.2f | $bar%.0f | ${if (flips.isEmpty) "none" else flips.mkString(",")} | ${if (ok) "pass" else "FAIL"} |%n"
      )
    }
    val failed = rows.filterNot(_._7)
    md.append(s"\n${rows.size - failed.size}/${rows.size} within the bar.\n")

    // d-family diagnostic (r9 verdict #2): candidate-pair count and bucket
    // occupancy at 1x vs Nx, next to the timings they explain. With the
    // per-word replica salt, raw_pairs should grow ~linearly in N (constant
    // near-dup density); quadratic growth would mean the salt failed and
    // the d2/d7/d11 ratios measure corpus semantics, not the engine.
    if (soakQueries.exists(_.startsWith("d"))) {
      val (p1x, h1x, m1x) = graft.queries.Dedup.candidateDiagnostics(spark, src)
      val (pNx, hNx, mNx) = graft.queries.Dedup.candidateDiagnostics(spark, out)
      md.append(s"\n## d-family candidate-pair diagnostic (d1 banding, corpus = documents + perturbed copy)\n\n")
      md.append("| scale | raw_pairs (= band-join output) | hot buckets | max bucket |\n")
      md.append("|---|---|---|---|\n")
      md.append(s"| 1x | $p1x | $h1x | $m1x |\n")
      md.append(s"| ${n}x | $pNx | $hNx | $mNx |\n")
      val growth = if (p1x > 0) pNx.toDouble / p1x else Double.NaN
      md.append(f"\nraw_pairs growth: $growth%.2fx at ${n}x replication (linear = ${n}x; quadratic ~ ${n.toLong * n}x).\n")
    }

    // m-family analog (r11 advice): Σ C(occ,2) over m10's (band, key)
    // buckets — the birthday-collision quadratic term the occupancy cap
    // exists to bound — measured at 1x vs Nx so "never all-pairs" is a
    // number, not an assumption.
    if (soakQueries.exists(_.startsWith("m1"))) {
      val (c1, h1, x1) = graft.queries.Multimodal.phashBandDiagnostics(spark, src)
      val (cN, hN, xN) = graft.queries.Multimodal.phashBandDiagnostics(spark, out)
      md.append(s"\n## m-family band-bucket diagnostic (m10 aHash 4x16 banding, corpus = documents + perturbed copy)\n\n")
      md.append("| scale | sum C(occ,2) (= uncapped pair-join output) | hot buckets | max occupancy |\n")
      md.append("|---|---|---|---|\n")
      md.append(s"| 1x | $c1 | $h1 | $x1 |\n")
      md.append(s"| ${n}x | $cN | $hN | $xN |\n")
      val g = if (c1 > 0) cN.toDouble / c1 else Double.NaN
      md.append(f"\npair growth: $g%.2fx at ${n}x (linear = ${n}x; quadratic ~ ${n.toLong * n}x); the occ<=64 cap bounds the join at 32x|band rows| regardless.\n")
    }
    print(md)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(reportFile), md.toString)

    // leave nothing behind in /tmp (prebuilt replicas are the caller's)
    if (prebuilt.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[soak] FAILED: ${failed.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
