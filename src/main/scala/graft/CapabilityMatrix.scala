package graft

/** Generated capability matrix (round-13 verdict #8): the status table is
  * derived from `SparkEntry.queries` + `SparkEntry.oracleSql` + the latest
  * driver `CORRECTNESS_r*.json`, so it CANNOT drift from the live surface
  * the way a hand-maintained table can. `runMain graft.CapabilityMatrix`
  * regenerates `CAPABILITY.md`; CapabilityMatrixSpec fails the suite when
  * the committed file differs from what the current code would generate
  * (the CI-style diff check).
  */
object CapabilityMatrix {

  private val Row =
    ("\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{\\s*\"rows_match\"\\s*:\\s*(true|false)" +
     "\\s*,\\s*\"schema_match\"\\s*:\\s*(true|false)" +
     "\\s*,\\s*\"hash_match\"\\s*:\\s*(true|false)").r

  /** (round, query -> "green"/failure-kind) from the newest
    * CORRECTNESS_r*.json in `repoDir`, if any. */
  def latestCorrectness(repoDir: String): Option[(Int, Map[String, String])] = {
    val dir = new java.io.File(repoDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json"))
    if (files.isEmpty) return None
    val newest = files.maxBy(f =>
      "\\d+".r.findFirstIn(f.getName).fold(0)(_.toInt))
    val round = "\\d+".r.findFirstIn(newest.getName).fold(0)(_.toInt)
    val text = new String(
      java.nio.file.Files.readAllBytes(newest.toPath), "UTF-8")
    val rows = Row.findAllMatchIn(text).map { m =>
      val status =
        if (m.group(2) == "true" && m.group(3) == "true" &&
            m.group(4) == "true") "green"
        else s"rows=${m.group(2)} schema=${m.group(3)} hash=${m.group(4)}"
      m.group(1) -> status
    }.toMap
    Some((round, rows))
  }

  def render(repoDir: String = "."): String = {
    val correctness = latestCorrectness(repoDir)
    val (roundNote, status) = correctness match {
      case Some((r, m)) => (s"driver gate `CORRECTNESS_r$r.json`", m)
      case None => ("no CORRECTNESS file found", Map.empty[String, String])
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb ++= "# Capability matrix (GENERATED — do not edit)\n\n"
    sb ++= "Regenerate with `sbt \"runMain graft.CapabilityMatrix\"`. "
    sb ++= "CapabilityMatrixSpec diffs this file against the live "
    sb ++= "`SparkEntry` surface on every test run.\n\n"
    sb ++= s"Queries: ${names.size}; with DuckDB oracle: "
    sb ++= s"${names.count(SparkEntry.oracleSql.contains)}; "
    sb ++= s"correctness source: $roundNote.\n\n"
    sb ++= "| query | oracle | last driver verdict |\n|---|---|---|\n"
    names.foreach { n =>
      val oracle = if (SparkEntry.oracleSql.contains(n)) "yes" else "rows-only"
      val verdict = status.getOrElse(n, "not yet gated")
      sb ++= s"| `$n` | $oracle | $verdict |\n"
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val repo = args.headOption.getOrElse(".")
    val out = java.nio.file.Paths.get(repo, "CAPABILITY.md")
    java.nio.file.Files.write(out, render(repo).getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
