package graft

/** Generated capability matrix (round-13 verdict #8): the status table is
  * derived from `SparkEntry.queries` + `SparkEntry.oracleSql` + a driver
  * `CORRECTNESS_r*.json`, so it CANNOT drift from the live surface the way
  * a hand-maintained table can. `runMain graft.CapabilityMatrix`
  * regenerates `CAPABILITY.md` against the newest correctness file;
  * CapabilityMatrixSpec fails the suite when the committed file differs
  * from what the current code would generate.
  *
  * Round-15 fix (r14 verdict #1): the drift check used to regenerate
  * against the NEWEST correctness file, so the driver writing
  * `CORRECTNESS_r{N+1}.json` after the builder's last commit reddened the
  * suite on a pure header byte even when every verdict was identical.
  * `driftError` now regenerates pinned to the round named in the
  * COMMITTED header and only separately requires that the newest file's
  * verdicts MATCH the pinned ones — a new driver file with identical
  * verdicts passes; a changed verdict or a changed query surface fails.
  */
object CapabilityMatrix {

  private val Row =
    ("\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{\\s*\"rows_match\"\\s*:\\s*(true|false)" +
     "\\s*,\\s*\"schema_match\"\\s*:\\s*(true|false)" +
     "\\s*,\\s*\"hash_match\"\\s*:\\s*(true|false)").r

  private val HeaderRound = "CORRECTNESS_r(\\d+)\\.json".r

  private def correctnessFiles(repoDir: String): Array[java.io.File] = {
    val dir = new java.io.File(repoDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json"))
  }

  private def roundOf(f: java.io.File): Int =
    "\\d+".r.findFirstIn(f.getName).fold(0)(_.toInt)

  private def parseVerdicts(f: java.io.File): Map[String, String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    Row.findAllMatchIn(text).map { m =>
      val status =
        if (m.group(2) == "true" && m.group(3) == "true" &&
            m.group(4) == "true") "green"
        else s"rows=${m.group(2)} schema=${m.group(3)} hash=${m.group(4)}"
      m.group(1) -> status
    }.toMap
  }

  /** (round, query -> "green"/failure-kind) from the newest
    * CORRECTNESS_r*.json in `repoDir`, if any. */
  def latestCorrectness(repoDir: String): Option[(Int, Map[String, String])] = {
    val files = correctnessFiles(repoDir)
    if (files.isEmpty) return None
    val newest = files.maxBy(roundOf)
    Some((roundOf(newest), parseVerdicts(newest)))
  }

  /** Verdicts from the specific round's file, if present. */
  def correctnessFor(repoDir: String, round: Int): Option[Map[String, String]] = {
    correctnessFiles(repoDir).find(roundOf(_) == round).map(parseVerdicts)
  }

  /** Render against a pinned round (header cites that file) or, with
    * `pinnedRound = None`, against the newest correctness file. */
  def render(repoDir: String = ".", pinnedRound: Option[Int] = None): String = {
    val correctness = pinnedRound match {
      case Some(r) => correctnessFor(repoDir, r).map(m => (r, m))
      case None    => latestCorrectness(repoDir)
    }
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

  /** The structural drift check (r14 verdict #1). Returns None when the
    * committed matrix is current, Some(message) otherwise. Fails when:
    *   - the committed file is missing or names no correctness round;
    *   - regenerating against the round named in the COMMITTED header
    *     differs byte-wise (query/oracle surface changed, or that file's
    *     verdicts changed);
    *   - a NEWER correctness file exists whose per-query verdicts differ
    *     from the pinned round's (a real driver-gate change).
    * A newer file with byte-different JSON but identical verdicts — the
    * driver's normal end-of-round write — passes.
    */
  def driftError(repoDir: String): Option[String] = {
    val path = java.nio.file.Paths.get(repoDir, "CAPABILITY.md")
    if (!java.nio.file.Files.exists(path))
      return Some("CAPABILITY.md missing — run: sbt \"runMain graft.CapabilityMatrix\"")
    val committed = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val pinned = HeaderRound.findFirstMatchIn(committed).map(_.group(1).toInt)
    pinned match {
      case None =>
        // No correctness file existed at generation time; any file now
        // present means the matrix should be regenerated against it.
        if (latestCorrectness(repoDir).isDefined)
          Some("CAPABILITY.md cites no correctness file but one exists — " +
            "regenerate with: sbt \"runMain graft.CapabilityMatrix\"")
        else if (committed != render(repoDir, None))
          Some("CAPABILITY.md is stale — regenerate with: " +
            "sbt \"runMain graft.CapabilityMatrix\"")
        else None
      case Some(r) =>
        if (committed != render(repoDir, Some(r)))
          return Some(s"CAPABILITY.md differs from the matrix generated " +
            s"against its own pinned CORRECTNESS_r$r.json — the query " +
            "surface or that file's verdicts changed; regenerate with: " +
            "sbt \"runMain graft.CapabilityMatrix\"")
        latestCorrectness(repoDir) match {
          case Some((latest, verdicts)) if latest != r =>
            val pinnedVerdicts = correctnessFor(repoDir, r).getOrElse(Map.empty)
            if (verdicts != pinnedVerdicts)
              Some(s"CORRECTNESS_r$latest.json verdicts differ from the " +
                s"pinned CORRECTNESS_r$r.json — regenerate with: " +
                "sbt \"runMain graft.CapabilityMatrix\"")
            else None // identical verdicts in a newer driver file: current
          case _ => None
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val repo = args.headOption.getOrElse(".")
    val out = java.nio.file.Paths.get(repo, "CAPABILITY.md")
    java.nio.file.Files.write(out, render(repo).getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
