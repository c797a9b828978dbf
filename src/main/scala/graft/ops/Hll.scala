package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct counting (Flajolet et al. 2007) with the
  * cross-engine determinism discipline of the repo's sketch family
  * (q90 CMS / q84 KMV): every sketch ingredient is integer or
  * hex-string arithmetic a SQL oracle replays bit-for-bit.
  *
  *  - hash = md5 of the value; REGISTER INDEX = the first 2 hex chars
  *    (m = 256 registers), RHO = 1 + leading-zero count of the next
  *    13 hex chars (52 bits), derived by string scanning (`^0*` match
  *    length + a 16-case nibble table) — no float log2 anywhere.
  *  - the register harmonic sum Σ 2^(-M_j) is scaled by 2^53 so every
  *    term is an exact BIGINT power of two: order-independent at any
  *    parallelism, exact on both engines (max possible sum
  *    256·2^53 = 2^61 < Long.Max).
  *  - the only doubles are the final α·m²·2^53 / S estimate and the
  *    small-range linear-counting branch m·ln(m/V₀) — each ONE pinned
  *    expression evaluated on identical integer inputs.
  *
  * Scale shape: registers are map-side-combinable MAX aggregations;
  * the sketch is a 256-row-per-group TABLE, never a driver array. The
  * exact distinct count rides the SAME distinct-(group, value)
  * exchange as register construction — one corpus-sized shuffle total,
  * carrying narrow pairs. (No large-range correction: a 52-bit-rho
  * sketch does not saturate below ~2^50 distincts.)
  */
object Hll {

  private val M = 256         // registers (p = 8 bits of the hash)
  private val RHO_BITS = 52   // 13 hex chars scanned for the leading 1
  private val SCALE = 53      // Σ 2^(SCALE - M_j) stays integral: M_j ≤ 53

  /** rho of a 13-hex-char string: 1 + leading-zero BIT count. */
  private def rhoExpr(hexPart: Column): Column = {
    val z = length(regexp_extract(hexPart, "^0*", 0)) // leading zero NIBBLES
    val d = hexPart.substr(z + lit(1), lit(1))        // first nonzero nibble
    val lzc = when(d.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(d.isin("4", "5", "6", "7"), 1)
      .when(d.isin("2", "3"), 2)
      .otherwise(3)                                   // '1'
    when(z === 13, RHO_BITS + 1).otherwise(z * 4 + lzc + 1)
  }

  /** Register table (group, hll_bucket, hll_rho) over RAW values — no
    * distinct pass: a duplicate value re-delivers the same (bucket,
    * rho) and MAX absorbs it, which is what makes this the streaming
    * twin's shape (one combinable aggregation; complete-mode snapshot
    * ≡ batch registers under any arrival order or restart).
    */
  def registers(df: DataFrame, groupCol: Column, valueCol: Column,
      groupName: String = "group"): DataFrame = {
    val h = md5(valueCol.cast("string"))
    // NULL values are ignored, the countDistinct convention: md5(null)
    // would otherwise emit a (null-bucket, null-rho) register row that
    // inflates the occupied-register count without contributing to the
    // harmonic sum — a silently biased estimate
    df.filter(valueCol.isNotNull)
      .select(groupCol.as(groupName),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("hll_bucket"),
        rhoExpr(substring(h, 3, 13)).as("__rho"))
      .groupBy(col(groupName), col("hll_bucket"))
      .agg(max(col("__rho")).as("hll_rho"))
  }

  /** Distinct estimate per group from a [[registers]] table (the
    * finisher a streaming snapshot or a persisted sketch runs through).
    */
  def estimateFromRegisters(regs: DataFrame,
      groupName: String = "group"): DataFrame = {
    val perGroup = regs.groupBy(col(groupName)).agg(
      sum(pow(lit(2.0), lit(SCALE) - col("hll_rho")).cast("long"))
        .as("__sNon"),
      count(lit(1)).as("__nb"))
    val nEmpty = lit(M.toLong) - col("__nb")
    val sTotal = (col("__sNon") + nEmpty * lit(1L << SCALE)).cast("double")
    val alpha = lit(0.7213 / (1.0 + 1.079 / M))
    val rawEst = alpha * lit(M.toDouble * M) * lit(math.pow(2.0, SCALE)) /
      sTotal
    val est = when(rawEst <= lit(2.5 * M) && nEmpty > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / nEmpty.cast("double")))
      .otherwise(rawEst)
    perGroup.select(col(groupName), round(est, 6).as("hll_est"))
  }

  /** Per-group HLL distinct estimate of `valueCol`, certified against
    * the exact distinct count from the same exchange. Output:
    * (groupCol, n_distinct, hll_est, rel_err), one row per group.
    */
  def distinctPerGroup(df: DataFrame, groupCol: Column,
      valueCol: Column, groupName: String = "group"): DataFrame = {
    // NULLs excluded on BOTH sides so n_distinct (the certification
    // baseline) agrees with countDistinct and with the registers table
    val pairs = df.filter(valueCol.isNotNull)
      .select(groupCol.as("__g"), valueCol.as("__v")).distinct()
    val h = md5(col("__v").cast("string"))
    val regs = pairs
      .select(col("__g"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("__b"),
        rhoExpr(substring(h, 3, 13)).as("__rho"))
      .groupBy(col("__g"), col("__b"))
      .agg(max(col("__rho")).as("__mj"), count(lit(1)).as("__nt"))
    val perGroup = regs.groupBy(col("__g")).agg(
      sum(col("__nt")).as("__exact"),
      sum(pow(lit(2.0), lit(SCALE) - col("__mj")).cast("long")).as("__sNon"),
      count(lit(1)).as("__nb"))
    val nEmpty = lit(M.toLong) - col("__nb")
    val sTotal = (col("__sNon") + nEmpty * lit(1L << SCALE)).cast("double")
    val alpha = lit(0.7213 / (1.0 + 1.079 / M))
    val rawEst = alpha * lit(M.toDouble * M) * lit(math.pow(2.0, SCALE)) /
      sTotal
    val est = when(rawEst <= lit(2.5 * M) && nEmpty > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / nEmpty.cast("double")))
      .otherwise(rawEst)
    perGroup.select(col("__g").as(groupName),
      col("__exact").as("n_distinct"),
      round(est, 6).as("hll_est"),
      round((est - col("__exact").cast("double")) /
        col("__exact").cast("double"), 6).as("rel_err"))
  }
}
