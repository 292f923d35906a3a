package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, StandardCopyOption}

/** CI-style drift check (round-13 verdict #8, mechanism fixed per round-14
  * verdict #1): the committed CAPABILITY.md must match what the CURRENT
  * SparkEntry surface generates against the correctness file NAMED IN THE
  * COMMITTED HEADER — and any newer driver correctness file must carry the
  * same per-query verdicts. Adding/removing a query or an oracle without
  * regenerating fails; a changed driver verdict fails; the driver writing
  * a new CORRECTNESS_r{N+1}.json with identical verdicts (its normal
  * end-of-round behavior) does NOT fail. */
class CapabilityMatrixSpec extends AnyFunSuite {

  test("CAPABILITY.md matches the matrix pinned to its own header (no drift)") {
    CapabilityMatrix.driftError(".") match {
      case Some(err) => fail(err)
      case None      => // current
    }
  }

  test("every query has a matrix row; every oracle key has a query") {
    val rendered = CapabilityMatrix.render(".")
    SparkEntry.queries.keys.foreach(n =>
      assert(rendered.contains(s"| `$n` |"), s"query $n missing from matrix"))
    // an oracle for a deleted query is dead weight the driver never runs
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without queries: $orphans")
  }

  // --- mechanism proofs (r14 verdict #1 "prove it") -----------------------

  /** Copy the committed matrix + its pinned correctness file into a
    * tempdir so we can manipulate the correctness-file set without
    * touching the repo. */
  private def stagedRepo(): (Path, Int) = {
    val dir = Files.createTempDirectory("capmatrix")
    dir.toFile.deleteOnExit()
    val committed = new String(
      Files.readAllBytes(java.nio.file.Paths.get("CAPABILITY.md")), "UTF-8")
    val round = "CORRECTNESS_r(\\d+)\\.json".r
      .findFirstMatchIn(committed).map(_.group(1).toInt)
      .getOrElse(fail("committed CAPABILITY.md names no correctness file"))
    Files.copy(java.nio.file.Paths.get("CAPABILITY.md"),
      dir.resolve("CAPABILITY.md"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(java.nio.file.Paths.get(s"CORRECTNESS_r$round.json"),
      dir.resolve(s"CORRECTNESS_r$round.json"),
      StandardCopyOption.REPLACE_EXISTING)
    (dir, round)
  }

  test("a NEWER correctness file with identical verdicts stays green") {
    val (dir, round) = stagedRepo()
    // the driver's end-of-round write: new filename + cosmetic JSON churn,
    // same verdicts. Reformat whitespace so byte-equality can't be what
    // passes the check.
    val pinned = new String(
      Files.readAllBytes(dir.resolve(s"CORRECTNESS_r$round.json")), "UTF-8")
    val churned = "  " + pinned.replace(":", " : ") + "\n"
    Files.write(dir.resolve("CORRECTNESS_r99.json"), churned.getBytes("UTF-8"))
    assert(CapabilityMatrix.driftError(dir.toString).isEmpty,
      "identical-verdict newer file must not redden the suite")
  }

  test("a NEWER correctness file with a CHANGED verdict fails") {
    val (dir, round) = stagedRepo()
    val pinned = new String(
      Files.readAllBytes(dir.resolve(s"CORRECTNESS_r$round.json")), "UTF-8")
    // flip the first hash_match:true to false — a real driver-gate change
    val flipped = pinned.replaceFirst("\"hash_match\"\\s*:\\s*true",
      "\"hash_match\": false")
    assert(flipped != pinned, "fixture has no green row to flip")
    Files.write(dir.resolve("CORRECTNESS_r99.json"), flipped.getBytes("UTF-8"))
    val err = CapabilityMatrix.driftError(dir.toString)
    assert(err.exists(_.contains("verdicts differ")),
      s"changed verdict must fail the drift check, got: $err")
  }

  test("a stale committed matrix (edited table body) fails against its own pin") {
    val (dir, _) = stagedRepo()
    val committed = new String(
      Files.readAllBytes(dir.resolve("CAPABILITY.md")), "UTF-8")
    Files.write(dir.resolve("CAPABILITY.md"),
      (committed + "| `phantom_query` | yes | green |\n").getBytes("UTF-8"))
    val err = CapabilityMatrix.driftError(dir.toString)
    assert(err.exists(_.contains("pinned")),
      s"edited matrix body must fail the drift check, got: $err")
  }
}
