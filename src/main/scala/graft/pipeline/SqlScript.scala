package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Post-load SQL script execution (SURVEY.md §2.5 K7, reference
  * `postDumpExecs` `Wrap.pm:373-398`): a guarded batch of SQL statements
  * run in order after a load, with `${var}` interpolation — the reference
  * evals a condition then runs each statement inside the load transaction.
  * On Spark the statements run against the session catalog (temp views /
  * tables registered by the load); each returns its DataFrame, mirroring
  * `doInDB`'s multi-result-set contract (`Wrap/DB.pm:159-161`).
  */
object SqlScript {

  case class CondExecs(condition: () => Boolean, statements: Seq[String])

  private val varRe = "\\$\\{([A-Za-z0-9_]+)\\}".r

  def interpolate(sql: String, vars: Map[String, String]): String =
    varRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        vars.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"undefined SQL variable $${${m.group(1)}}"))))

  /** Run each guarded batch whose condition holds; statements execute in
    * order, results collected per statement. */
  def run(spark: SparkSession, execs: Seq[CondExecs],
          vars: Map[String, String] = Map.empty): Seq[DataFrame] =
    execs.flatMap { ce =>
      if (ce.condition()) ce.statements.map(s => spark.sql(interpolate(s, vars)))
      else Nil
    }
}
