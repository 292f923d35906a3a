package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Round-7 verdict #5: the session-scoped persist-once registries key by
  * (session, input fingerprint) — re-registering the SAME directory with
  * a CHANGED fingerprint (regenerated testdata) must unpersist the stale
  * entry at insert time, not leak it until session teardown. */
class CacheEvictionSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  /** Copy one table file into a fresh dir the test can mutate. */
  private def scratchDir(tables: String*): String = {
    val dir = Files.createTempDirectory("evict").toString
    tables.foreach { t =>
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$dir/$t.parquet"), StandardCopyOption.COPY_ATTRIBUTES)
    }
    dir
  }

  private def touch(path: String): Unit = {
    val f = new java.io.File(path)
    assert(f.setLastModified(f.lastModified() + 60000L), s"cannot touch $path")
  }

  test("Dedup.verifiedPairs: a changed documents fingerprint unpersists the stale frame") {
    val dir = scratchDir("documents")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val a = Dedup.verifiedPairs(spark, dir)
    a.count()
    // the pairs frame is eagerly localCheckpoint-backed (its storage lives
    // on the checkpoint RDD, invisible to Dataset.storageLevel) — assert
    // block storage through the bridge instead
    assert(org.apache.spark.sql.graftbridge.Bridge.checkpointRdd(a)
      .exists(_.getStorageLevel.useMemory) ||
      a.storageLevel === StorageLevel.MEMORY_AND_DISK)
    val afterFirst = persisted
    touch(s"$dir/documents.parquet")
    val b = Dedup.verifiedPairs(spark, dir)
    b.count()
    assert(b ne a)
    // NOTE: a.storageLevel is NOT a valid observable here — a and b have
    // sameResult canonical plans (same directory), so the CacheManager
    // lookup for `a` finds B's fresh entry. The net persisted-RDD count
    // is unambiguous: insert + evict must not grow it.
    assert(persisted === afterFirst,
      s"stale-fingerprint entry leaked: $persisted persisted RDDs vs $afterFirst")
  }

  test("Similarity cell assignment: a changed embeddings fingerprint nets zero new persisted RDDs") {
    val dir = scratchDir("documents", "embeddings")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    Similarity.embeddingAnnIvf(spark, dir).count()
    val afterFirst = persisted
    touch(s"$dir/embeddings.parquet")
    Similarity.embeddingAnnIvf(spark, dir).count()
    // the fresh-fingerprint insert must have evicted the stale one: the
    // net persisted-RDD count cannot grow across the re-registration
    assert(persisted === afterFirst,
      s"stale cell assignment leaked: $persisted persisted RDDs vs $afterFirst")
  }
}
