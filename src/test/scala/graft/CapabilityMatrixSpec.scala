package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-style drift check (round-13 verdict #8): the committed
  * CAPABILITY.md must be byte-equal to what the CURRENT SparkEntry
  * surface + latest CORRECTNESS file generate — adding/removing a query
  * or an oracle without regenerating the matrix fails the suite. */
class CapabilityMatrixSpec extends AnyFunSuite {

  test("CAPABILITY.md matches the generated matrix (no drift)") {
    val repo = new java.io.File("CAPABILITY.md")
    assert(repo.exists(),
      "CAPABILITY.md missing — run: sbt \"runMain graft.CapabilityMatrix\"")
    val committed = new String(
      java.nio.file.Files.readAllBytes(repo.toPath), "UTF-8")
    val generated = CapabilityMatrix.render(".")
    assert(committed === generated,
      "CAPABILITY.md is stale — regenerate with: " +
        "sbt \"runMain graft.CapabilityMatrix\"")
  }

  test("every query has a matrix row; every oracle key has a query") {
    val rendered = CapabilityMatrix.render(".")
    SparkEntry.queries.keys.foreach(n =>
      assert(rendered.contains(s"| `$n` |"), s"query $n missing from matrix"))
    // an oracle for a deleted query is dead weight the driver never runs
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without queries: $orphans")
  }
}
