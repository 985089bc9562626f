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

  /** S8 `doInDB` twin, spark.sql flavor (`Wrap/DB.pm:133-163`): one
    * parameterized statement with DBI-style positional `?` binding —
    * values travel as bound parameters (Catalyst literals), never spliced
    * into SQL text. */
  def exec(spark: SparkSession, sql: String, params: Seq[Any] = Nil): DataFrame =
    if (params.isEmpty) spark.sql(sql) else spark.sql(sql, params.toArray)

  /** Multi-statement script → one DataFrame per statement, the reference's
    * multi-result-set contract (`$sth->{odbc_more_results}` loop,
    * `Wrap/DB.pm:159-161`). Named `:param` binding (positional `?` is
    * ambiguous across statements). */
  def execMulti(spark: SparkSession, script: String,
                params: Map[String, Any] = Map.empty): Seq[DataFrame] =
    splitStatements(script).map { s =>
      if (params.isEmpty) spark.sql(s) else spark.sql(s, params)
    }

  /** Split an SQL script on `;` outside string literals ('' and ""
    * doubling included — each quote toggles the state). */
  def splitStatements(script: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    script.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case ';'        => out += cur.toString; cur.clear()
        case c          => cur += c
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
