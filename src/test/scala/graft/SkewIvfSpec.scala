package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Skew}

class SkewIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedDistinctCount equals plain count_distinct on a skewed key") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val plain = li.groupBy("l_returnflag")
      .agg(count_distinct($"l_orderkey").as("distinct_count"))
    val salted = Skew.saltedDistinctCount(li, Seq("l_returnflag"), "l_orderkey", 8)
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin equals plain join") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, TestSpark.sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_name")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"),
        $"o_orderkey", 4)
      .select("o_orderkey", "c_name")
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("ivfTopK: true cosines from probed cells, sorted; decent recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val rest = emb.filter($"vec_id" =!= 0)
    val ivf = Similarity.ivfTopK(rest, "vec_id", "embedding", q, 10,
      nlist = 16, nprobe = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    // values are the exact cosines (probing prunes candidates, never alters scores)
    val all = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-12) }
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).toSeq.sorted.reverse)
    val brute10 = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.map(_._1).toSet.intersect(brute10).size >= 2)
  }

  test("ivfTopKKMeans: trained centroids, exact cosines from probed cells, decent recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val rest = emb.filter($"vec_id" =!= 0)
    val ivf = Similarity.ivfTopKKMeans(rest, "vec_id", "embedding", q, 10,
      nlist = 16, nprobe = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    val all = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-12) }
    val brute10 = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // cosine-trained cells should cluster directionally: recall at
    // least on par with the sample-centroid variant
    assert(ivf.map(_._1).toSet.intersect(brute10).size >= 2)
  }
}
