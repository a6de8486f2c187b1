package graft

import java.io.File

/** Layered runtime configuration — the reference's startup contract
  * (jonesy.py:7-11): `.env.shared` values are overridden by
  * `.env.secret` values, and both are overridden by the process
  * environment. Credentials therefore never need to be baked into the
  * shared file, and local overrides never need file edits.
  */
object Config {

  /** dotenv-style parse: KEY=VALUE lines, `#` comments and blanks
    * skipped, single/double quotes around the value stripped,
    * `export ` prefixes tolerated. Missing file → empty layer. */
  def parseDotenv(f: File): Map[String, String] =
    if (!f.isFile) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(l => if (l.startsWith("export ")) l.drop(7).trim else l)
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) if k.trim.nonEmpty =>
              Some(k.trim -> stripQuotes(v.trim))
            case _ => None
          }
        }.toMap
      finally src.close()
    }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '"' && v.last == '"') ||
          (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** The merged view: shared < secret < process env (later wins —
    * reference jonesy.py:7-11's dict-merge order). `dir` is where the
    * dotenv files live; `env` is injectable for tests. */
  def load(dir: String = ".",
           env: Map[String, String] = sys.env): Map[String, String] =
    parseDotenv(new File(dir, ".env.shared")) ++
      parseDotenv(new File(dir, ".env.secret")) ++
      env
}
