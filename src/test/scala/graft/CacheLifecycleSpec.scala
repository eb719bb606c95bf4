package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The plain dedup entry points must not leak their persisted
  * intermediates into a long-lived session: after the returned plan
  * executes once, the caches are released (asynchronously, via a
  * one-shot QueryExecutionListener). The *WithCaches variants leave
  * lifetime to the caller.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cachedRddIds(): Set[Int] =
    spark.sparkContext.getRDDStorageInfo.map(_.id).toSet

  private def eventually(timeoutMs: Long = 15000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline && !cond) Thread.sleep(100)
    cond
  }

  test("plain lshCandidatePairs releases its signature cache after first use") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
    val before = cachedRddIds()
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
    pairs.count() // first consuming execution
    assert(eventually() { cachedRddIds().subsetOf(before) },
      "signature cache entry still present after the pair plan executed")
  }

  test("plain ngramJaccardPairs releases all three intermediates after first use") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
    val before = cachedRddIds()
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
    pairs.count()
    assert(eventually() { cachedRddIds().subsetOf(before) },
      "posting-list/prefix caches still present after the pair plan executed")
  }

  test("WithCaches variant leaves the cache to the caller") {
    // distinct parameterization from the plain-call tests above, so an
    // unconsumed listener from those can never match this plan
    val docs = Tables.documents(spark, TestSpark.sf).limit(60)
    val (pairs, sigs) =
      Dedup.lshCandidatePairsWithSignatures(docs, "doc_id", "text", numHashes = 32, bands = 8)
    pairs.count()
    assert(sigs.storageLevel != StorageLevel.NONE,
      "caller-managed signature cache must survive execution")
    sigs.unpersist(blocking = true)
  }

  test("unrelated executions do not release caches prematurely") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(40)
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 16, bands = 4)
    // executions that do NOT consume the signatures
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10).count()
    Thread.sleep(500) // allow listener-bus delivery of those events
    val n1 = pairs.count() // signatures still valid: plan executes correctly
    val n2 = pairs.count() // after release: recompute path, same answer
    assert(n1 == n2)
  }
}
