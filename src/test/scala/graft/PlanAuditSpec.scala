package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over EVERY declared query: the scale
  * posture the engine promises (no cartesian products, no unpartitioned
  * windows, no plain SortMergeJoin where a broadcast was intended) must
  * hold for the whole `SparkEntry.queries` surface, not just the ones a
  * verdict happened to audit. Runs at sf0.001 — plans, not data, are
  * under test.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // queries where a BroadcastNestedLoopJoin is the *intended* physical
  // plan: a deliberately tiny broadcast side (1-10 rows: query vectors,
  // dataset bounds, boundary cells) joined on a non-equi predicate
  private val bnljAllowed = Set("q13_hilbert_sort", "q14_spatial_order",
    "q17_spatial_join", "q26_ann_brute", "q35_geo_measures",
    "q44_ann_ivf", "q45_ann_batch", "q12_morton_sort", "q33_quadkey",
    "q54_tfidf", "q57_unigram_lm", "q58_mixture_sample", "q59_ann_sq8",
    "q61_bigram_pmi", "q62_dsir_weights", "q64_ann_recall",
    "q67_blocklist", "q82_quality_gate", // q82: broadcast 1-row corpus count
    "q84_kmv_overlap", // q84: 1-row stats x 1-row exact-count certification
    "q91_bm25", // q91: broadcast 1-row corpus stats (N, Σdl, df)
    "q92_bigram_lm", // q92: broadcast 1-row successor-vocabulary count
    "q94_zipf_stats", // q94: 1-row regression x 1-row vocabulary totals
    "q97_term_drift", // q97: broadcast 1-row totals (V, Na, Nb)
    "q100_hard_negatives", // q100: broadcast 10 query vectors x corpus
    "q101_balance_chi2", // q101: 1-row chi2 sum x 1-row (N, n_rows, n_cols)
    "q105_dedup_recall", // q105: bounded calibration sample all-pairs
    "q106_ppl_buckets", // q106: broadcast 1-row successor-vocab count (q92)
    "q108_matryoshka", // q108: broadcast 10 query vectors x corpus, per tier
    "q111_embed_decontam", // q111: broadcast 1-row eval-vector aggregate
    "q112_lsh_tune", // q112: bounded calibration sample + 1-row min-err
    "q116_budget_curve", // q116: broadcast 1-row corpus token total
    "q120_ks_drift", // q120: histogram x 1-row totals x 1-row max
    "q121_mix_plan", // q121: sources-sized x 1-row total/weight-sum
    "q125_vocab_curve", // q125: broadcast 1-row corpus token total
    "q138_rfm_segments", // q138: 1-row anchor-ts x 1-row user count
    "q141_user_lifecycle", // q141: 1-row corpus max-week broadcast
    "q142_silhouette", // q142: bounded sample x corpus (q26 pattern)
    "q146_pareto_events", // q146: 1-row totals x ranked user table
    "q147_compaction_plan", // q147: 1-row byte-target broadcast
    "q151_hll_rollup", // q151: 1-row exact total x 1-row merged estimate
    "q163_knn_accuracy", // q163: bounded sample x corpus (q142 pattern)
    "q162_burstiness", // q162: 1-row corpus doc-count broadcast
    "q161_heaps", // q161: 1-row doc total x ~log2(n) checkpoint fit
    "q168_cuped", // q168: 1-row min-week + 1-row moment broadcasts
    "q167_pchart_errors") // q167: 1-row center-line broadcast

  test("no query plan contains a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian")
    }
  }

  /** Structural auto-allow for the 1-row-stats broadcast shape: a BNLJ
    * is fine when every logical join that could have planned as one (no
    * equi condition) has a side whose row count is STATICALLY bounded —
    * a global aggregate (maxRows = 1) or a limit. Queries whose tiny
    * side is only dynamically bounded (a deterministic sample filter)
    * stay on the name allowlist above.
    */
  private def allNonEquiJoinsBounded(
      qe: org.apache.spark.sql.execution.QueryExecution): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    // Spark extracts hash keys only from TOP-LEVEL conjuncts
    // (ExtractEquiJoinKeys splits on And) — an EqualTo buried under an
    // Or (`a.x = b.x OR a.y = b.y`) still plans as BNLJ, so collectFirst
    // over the whole tree misclassified such joins as equi
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    val nonEqui = joins.filter { j =>
      !j.condition.exists(c => conjuncts(c).exists {
        case _: EqualTo | _: EqualNullSafe => true
        case _                             => false
      })
    }
    def bounded(j: Join): Boolean =
      j.left.maxRows.exists(_ <= 1024L) || j.right.maxRows.exists(_ <= 1024L)
    // the caller only reaches here when the executed plan HAS a BNLJ: if
    // classification finds no non-equi candidate, some join we called
    // equi produced it — bound ALL joins rather than pass vacuously
    if (nonEqui.isEmpty) joins.forall(bounded) else nonEqui.forall(bounded)
  }

  test("broadcast nested loop joins only where a tiny side is intended") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val qe = fn(spark, dir).queryExecution
      val plan = qe.executedPlan.toString
      if (!bnljAllowed(name) && plan.contains("BroadcastNestedLoopJoin"))
        assert(allNonEquiJoinsBounded(qe),
          s"$name has a BNLJ whose broadcast side is not statically " +
            "bounded (global aggregate / limit) and is not allowlisted")
    }
  }

  test("q27 candidates come from the LSH band join, never a label block") {
    // the round-3 verdict's last scale-killer: a label-blocked all-pairs
    // self join is quadratic within hot labels. Pin the fix: the only
    // join keys feeding the candidate set are the band columns.
    val qe = SparkEntry.queries("q27_embedding_dedup")(spark, dir).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(!j.condition.exists(_.toString.contains("label")),
        s"q27 must not join on label: ${j.condition}")
    }
    assert(joins.exists(_.condition.exists(_.toString.contains("__bandSig"))),
      "q27 must block on band signatures")
  }

  test("sketch hot paths are codegen expressions, not UDFs") {
    // minhash/simhash/LSH/IVF computations run per document/vector — a
    // ScalaUDF there breaks whole-stage codegen and pays row
    // serialization both ways
    for (name <- Seq("q20_dedup_exact", "q27_embedding_dedup",
        "q28_minhash_dedup", "q29_simhash_dedup", "q31_ann_lsh",
        "q39_dedup_clusters", "q44_ann_ivf", "q45_ann_batch",
        "q47_ngram_jaccard", "q48_repetition", "q49_pii_scrub",
        "q50_decontaminate", "q51_kmeans", "q52_seq_packing",
        "q53_semdedup", "q70_winnowing", "q73_bloom_dedup",
        "q74_char_entropy", "q77_bpe_tokenize", "q78_logreg_score")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("UDF"), s"$name still contains a UDF node")
    }
  }

  test("resize/lum-sum run as codegen expressions, not mapPartitions " +
      "(r15 #6)") {
    // the former mapPartitions + Row-encoder forms added a
    // SerializeFromObject/DeserializeToObject pair EACH, breaking
    // whole-stage codegen twice on the q188 chain. The only object
    // boundary allowed to remain is the synthetic-PNG FIXTURE generator
    // (test-data synthesis, not a product operator) — so exactly one
    // serialize, and both kernels present as expressions.
    val plan = SparkEntry.queries("q188_image_resize")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val lower = plan.toLowerCase
    assert(lower.contains("resizepayload"),
      s"q188 resize is not the ResizePayload expression:\n$plan")
    assert(lower.contains("lumstats"),
      s"q188 lum reduction is not the LumStats expression:\n$plan")
    val boundaries = "SerializeFromObject".r.findAllIn(plan).size
    assert(boundaries <= 1,
      s"q188 has $boundaries object boundaries (fixture generator is " +
        s"the only one allowed):\n$plan")
  }

  test("no mapPartitions on ANY media query path except withSynthetic* " +
      "fixture generators (r16 #2: decode kernels are expressions)") {
    // round-17 closes the promotion the resize pin started: every media
    // decode kernel (meta, aHash, audio features/fp, GIF frame
    // stats/hashes, scene cuts) is a codegen Catalyst expression; the
    // ONLY object boundaries left in a media plan are the synthetic-
    // payload FIXTURE generators (test-data synthesis, not operators).
    // Expected fixture counts per query pin exactly that.
    val fixtureBoundaries = Map(
      "q32_multimodal_decode" -> 0, // payload = encode(text), no fixture
      "q46_image_decode"      -> 1, // withSyntheticPng
      "q175_phash_dedup"      -> 1, // withSyntheticClassPng
      "q176_phash_clusters"   -> 1,
      "q178_audio_decode"     -> 1, // withSyntheticWav
      "q179_audio_gate"       -> 1,
      "q181_video_frames"     -> 1, // withSyntheticGif
      // ONE withSyntheticClassWav fixture, but audioDedup self-joins the
      // signature frame so the fixture SUBTREE appears on both join
      // sides of the logical plan (physical reuse dedupes the exchange)
      "q182_audio_dedup"      -> 2,
      "q183_video_dedup"      -> 1, // withSyntheticClassGif
      "q184_scene_cuts"       -> 1, // withSyntheticSceneGif
      "q185_crossmodal_gate"  -> 2) // WAV + SceneGif fixtures
    for ((name, expected) <- fixtureBoundaries) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan.toString
      val boundaries = "SerializeFromObject".r.findAllIn(plan).size
      assert(boundaries <= expected,
        s"$name has $boundaries object boundaries, expected <= $expected " +
          s"(fixture generators only):\n$plan")
    }
    // and every kernel presents as its expression on the operator plan
    // directly (query-level plans can truncate at a localCheckpoint —
    // q175's capped pair join checkpoints the signature frame)
    import graft.ops.Multimodal
    val docs = spark.range(0, 8).toDF("doc_id")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString.toLowerCase
    val png = Multimodal.withSyntheticClassPng(docs, "doc_id", 4)
    val wav = Multimodal.withSyntheticWav(docs, "doc_id")
    val gif = Multimodal.withSyntheticGif(docs, "doc_id")
    assert(planOf(Multimodal.withDecodedMeta(
      png.withColumn("media_type", org.apache.spark.sql.functions.lit("image")),
      "payload", "media_type")).contains("decodedmeta"))
    assert(planOf(Multimodal.withAHash(png, "payload")).contains("ahash"))
    assert(planOf(Multimodal.withAudioFeatures(wav, "payload"))
      .contains("audiofeatures"))
    assert(planOf(Multimodal.withAudioFingerprint(wav, "payload"))
      .contains("audiofp"))
    assert(planOf(Multimodal.sampleGifFrameStats(gif, "payload", "doc_id"))
      .contains("gifframestats"))
    assert(planOf(Multimodal.withFrameHashes(gif, "payload", "doc_id"))
      .contains("framehashes"))
    assert(planOf(Multimodal.sceneChangeStats(gif, "payload", "doc_id"))
      .contains("scenestats"))
  }

  test("videoNearDups never broadcasts a per-video relation (r16 x100 " +
      "OOM)") {
    // every join in the operator has an O(corpus-rows) build side
    // (per-video stats, per-video surviving counts); AQE converted one
    // to broadcast at the x100 class-scaled tier and OOMed the driver —
    // the shuffle_hash hints must hold on ALL of them
    import spark.implicits._
    val fh = (1 to 2000).flatMap(i => (1 to 4).map(f =>
      (i.toLong, (f % 17).toLong, ((i % 41) * f).toLong)))
      .toDF("doc_id", "frame_hi", "frame_lo")
    val plan = graft.ops.Multimodal.videoNearDups(fh, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastExchange"),
      s"a per-video relation is broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), plan)
    // same invariant for the ngram path's per-document sizes joins
    val docs = (1 to 500).map(i =>
      (i.toLong, s"w${i % 7} w${i % 11} w${i % 13} w${i % 17} w$i common"))
      .toDF("doc_id", "text")
    val nplan = graft.ops.Dedup
      .ngramJaccardNearDups(docs, "text", "doc_id", n = 4)
      .queryExecution.executedPlan.toString
    assert(!nplan.contains("BroadcastHashJoin") &&
      !nplan.contains("BroadcastExchange"),
      s"a per-document relation is broadcast:\n$nplan")
  }

  test("q73's confirm join probes only bloom-positive rows") {
    // the bloom contract: the exact digest join must sit behind the
    // bitmap prefilter (probe side filtered on bloom_hit), and the
    // miss branch must reach the output with NO join at all
    val qe = SparkEntry.queries("q73_bloom_dedup")(spark, dir).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, s"q73 expects exactly one join, got ${joins.size}")
    assert(joins.head.toString.contains("bloom_hit"),
      "q73's join must probe the bloom_hit-filtered branch")
    assert(qe.optimizedPlan.toString.contains("NOT bloom_hit"),
      "q73's miss branch (NOT bloom_hit) must bypass the join")
  }

  test("dedup family plans contain no digest-partitioned window") {
    // round-6 verdict finding #1: a Window.partitionBy(digest) sends
    // every row carrying a given digest to ONE task — at 100 TB the hot
    // digests are exactly the semantics-bearing ones (an error page
    // duplicated millions of times, a site-wide boilerplate block).
    // The skew-safe shape is combinable aggregation + join-back; pin it
    // by requiring these plans to contain NO Window node at all.
    for (name <- Seq("q20_dedup_exact", "q60_cross_dedup",
        "q79_block_scrub", "q87_boilerplate")) {
      val windows = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }
      assert(windows.isEmpty,
        s"$name must decide survival/df with combinable aggregations, " +
          s"not a digest window (hot-key serialization): $windows")
    }
  }

  test("every window operator is partitioned (no global windows)") {
    // an unpartitioned window serializes the table through one task;
    // windowspecdefinition(..., specifiedwindowframe...) with an empty
    // partition clause renders as "windowspecdefinition(<order>," with
    // no partitionBy columns — detect via the optimized plan's Window
    // nodes instead: partitionSpec must be non-empty
    SparkEntry.queries.foreach { case (name, fn) =>
      val plans = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      plans.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$name has a window with no partition spec")
      }
    }
  }
}
