package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the vector-compression scale path that
  * complements SQ8 (q59): the embedding space is split into `m`
  * subspaces, each quantized by its own k-entry codebook, so a vector
  * stores as m small codes (m bytes at k ≤ 256 — 32× smaller than
  * float32 at m=8 over 64 dims) and query scans read codes + per-query
  * lookup tables instead of floats.
  *
  * Scale shape mirrors [[KMeans]]:
  *  - codebook init: the deterministic stride sample ([[Ann.ivfCentroids]]),
  *    sliced into subvectors — one scan, k×dims floats to the driver;
  *  - refinement: codegen [[graft.functions.SketchExpressions.PqEncode]]
  *    assignment + ONE exact fixed-point mean update per subspace, all
  *    subspaces in the same aggregation (the shuffle carries m×k×subDim
  *    partial sums per task, never vectors);
  *  - the trained codebooks are a bounded model (m×k×subDim doubles)
  *    carried into generated code as reference objects;
  *  - ADC scan: per-query dot/norm lookup tables (m×k doubles) — m table
  *    reads + m adds per corpus row, no multiplies in the hot loop.
  *
  * Determinism contract (what lets DuckDB re-derive the whole path):
  * assignment is L2 argmin with strict-< ascending scan (ties → lowest
  * code = ROW_NUMBER(ORDER BY dist, c)); the mean update is the
  * [[KMeans.Scale]] fixed-point sum (exact integers, any summation
  * order); empty codes keep their init entry.
  */
object Pq {

  /** Train m per-subspace codebooks of k entries each over `dims`-dim
    * vectors: stride-sample init + one fixed-point Lloyd refinement.
    *
    * @return cb(s)(c)(i): subspace s, code c, within-subspace dim i
    */
  def trainCodebooks(df: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int, dims: Int): Array[Array[Array[Double]]] = {
    require(dims % m == 0, s"dims=$dims must be divisible by m=$m")
    val sess = df.sparkSession
    val aqePrev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    // AQE off for the two training collects: stride-init and the single
    // refinement aggregation are fixed scan→agg shapes over a bounded
    // model — adaptive staging only adds per-exchange job scheduling it
    // can never improve (the LogReg iteration rationale,
    // ops/LogReg.scala:196-203)
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try trainCodebooksCore(df, vecCol, idCol, m, k, dims)
    finally sess.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }

  private def trainCodebooksCore(df: DataFrame, vecCol: String,
      idCol: String, m: Int, k: Int, dims: Int): Array[Array[Array[Double]]] = {
    val sub = dims / m
    val init = Ann.ivfCentroids(df, vecCol, idCol, k)
    val cb0: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      init.map(v => v.slice(s * sub, (s + 1) * sub).map(_.toDouble)))
    // one refinement pass: assign with cb0 (codegen kernel), then exact
    // fixed-point means per (subspace, code, dim) in ONE aggregation —
    // the collect is the bounded m×k×sub model (4096 doubles at
    // m=4,k=16,sub=16), the same driver-synchronization contract as
    // KMeans.kmeans
    val rows0 = df
      .select(graft.functions.SketchExpressions
          .pq_encode(col(vecCol), cb0).as("__codes"),
        posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select((col("__i") / sub).cast("int").as("__s"), col("__i"),
        col("__x"),
        element_at(col("__codes"), (col("__i") / sub).cast("int") + 1)
          .as("__c"))
      .groupBy(col("__s"), col("__c"), col("__i"))
      .agg(sum(round(col("__x").cast("double") * KMeans.Scale).cast("long"))
          .as("__sum"),
        count(lit(1)).as("__n"))
    val rows = graft.util.CollectCapped(rows0,
      256L * KMeans.MaxDims, "PQ codebook partial sums (m x k x subDim)")
    // empty codes keep their init entry (mirrored by the oracle's
    // COALESCE over a LEFT JOIN from the init table)
    val cb1 = cb0.map(_.map(_.clone()))
    rows.foreach { r =>
      val s = r.getInt(0); val c = r.getInt(1); val i = r.getInt(2)
      cb1(s)(c)(i - s * sub) =
        r.getLong(3).toDouble / (r.getLong(4) * KMeans.Scale)
    }
    cb1
  }

  /** Per-query ADC lookup tables against trained codebooks:
    * (dotLut(s)(c), normLut(s)(c)) = (⟨cb(s)(c), q_s⟩, |cb(s)(c)|²).
    */
  def adcLuts(cb: Array[Array[Array[Double]]], query: Array[Float])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val m = cb.length
    val dotLut = Array.ofDim[Array[Double]](m)
    val normLut = Array.ofDim[Array[Double]](m)
    var off = 0
    var s = 0
    while (s < m) {
      val sub = cb(s)(0).length
      dotLut(s) = cb(s).map { cent =>
        var d = 0.0; var i = 0
        while (i < sub) { d += cent(i) * query(off + i).toDouble; i += 1 }
        d
      }
      normLut(s) = cb(s).map { cent =>
        var n = 0.0; var i = 0
        while (i < sub) { n += cent(i) * cent(i); i += 1 }
        n
      }
      off += sub
      s += 1
    }
    (dotLut, normLut)
  }

  /** ADC approximate-cosine column for a corpus of PQ codes. */
  def adcCosine(codes: Column, cb: Array[Array[Array[Double]]],
      query: Array[Float]): Column = {
    val (dotLut, normLut) = adcLuts(cb, query)
    var qn = 0.0
    var i = 0
    while (i < query.length) {
      qn += query(i).toDouble * query(i).toDouble; i += 1
    }
    graft.functions.SketchExpressions.pq_adc_cosine(codes, dotLut, normLut,
      math.sqrt(qn))
  }
}
