package graft.pipeline

/** Command-line config overrides (`getOptions`, reference
  * `Wrap/Common.pm:370-407`): `--DB key=value` / `--File key=value` /
  * `--process key=value` / `--config key=value` override the global layer;
  * `--load<N><section> key=value` overrides one load. Unknown keys are
  * rejected with the available-options listing, numeric-typed keys are
  * converted (the reference's looks_like_number coercion).
  */
object CliOverrides {

  case class Overrides(
      global: Map[String, Map[String, Any]],
      perLoad: Map[Int, Map[String, Map[String, Any]]])

  private val sections = Set("DB", "FTP", "File", "process", "config")
  private val loadArg = "^--load(\\d+)(DB|FTP|File|process)$".r
  private val globalArg = "^--(DB|FTP|File|process|config)$".r

  /** @param permitted  section → key → sample default (numeric sample ⇒
    *                   numeric conversion), the `%hashCheck` analog.
    */
  def parse(args: Seq[String], permitted: Map[String, Map[String, Any]])
      : Either[String, Overrides] = {
    var global = Map.empty[String, Map[String, Any]]
    var perLoad = Map.empty[Int, Map[String, Map[String, Any]]]
    val errors = scala.collection.mutable.Buffer[String]()

    def convert(section: String, key: String, value: String): Option[Any] =
      permitted.get(section).flatMap(_.get(key)) match {
        case None => None
        case Some(_: Int) | Some(_: Long) | Some(_: Double) =>
          Some(try { if (value.contains('.')) value.toDouble else value.toLong }
            catch { case _: NumberFormatException => value })
        case Some(_: Boolean) => Some(value == "1" || value.equalsIgnoreCase("true"))
        case Some(_) => Some(value)
      }

    var i = 0
    while (i < args.length) {
      val arg = args(i)
      val kv = if (i + 1 < args.length) args(i + 1) else ""
      val eq = kv.indexOf('=')
      def key = kv.substring(0, eq)
      def value = kv.substring(eq + 1)
      arg match {
        case globalArg(section) if eq > 0 =>
          convert(section, key, value) match {
            case Some(v) => global = global.updated(section,
              global.getOrElse(section, Map.empty) + (key -> v))
            case None => errors += s"option not allowed: --$section $key=<value>"
          }
          i += 2
        case loadArg(n, section) if eq > 0 =>
          convert(section, key, value) match {
            case Some(v) =>
              val li = n.toInt
              val cur = perLoad.getOrElse(li, Map.empty)
              perLoad = perLoad.updated(li,
                cur.updated(section, cur.getOrElse(section, Map.empty) + (key -> v)))
            case None => errors += s"option not allowed: --load$n$section $key=<value>"
          }
          i += 2
        case other =>
          errors += s"unrecognized argument: $other"
          i += 1
      }
    }
    if (errors.nonEmpty) {
      val available = permitted.toSeq.sortBy(_._1).flatMap { case (s, keys) =>
        keys.keys.toSeq.sorted.map(k => s"--$s $k=<value>")
      }.mkString("\n")
      Left(errors.mkString("\n") +
        "\n===> available options (use --load<N><group> for load-specific settings):\n" +
        available)
    } else Right(Overrides(global, perLoad))
  }
}
