package graft

import org.apache.spark.sql.SparkSession

/** Manual probe of the SQL-registered function surface
  * (`EtlFunctions.register`): run with `Test/runMain graft.SqlSurfaceProbe`.
  * Prints one line per probe; used by the verify workflow. */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.EtlFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_is_holiday('AT','20120409') AS easter_monday,
        |  graft_add_days_hol('20121224', 1, 'D.mmm.Y', 'AT') AS after_xmas,
        |  graft_coerce_datetime('02.01.95') AS short_year,
        |  graft_normalize_numerics('22.123.123,013', '.', ',') AS german_num,
        |  graft_add_months_roll('20121030', 16) AS roll_fwd""".stripMargin).head()
    println(s"PROBE1: ${r.mkString(" | ")}")
    val r2 = spark.sql(
      "SELECT graft_is_holiday('XX','20120409') AS unknown_cal, " +
      "graft_coerce_numeric(NULL) AS null_in, graft_coerce_datetime('') AS empty_in").head()
    println(s"PROBE2: ${r2.mkString(" | ")}")
    spark.stop()
  }
}
