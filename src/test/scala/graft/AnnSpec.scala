package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Ann

class AnnSpec extends SparkSpec {

  lazy val embeds: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val queries: DataFrame = embeds.filter(col("vec_id") < 8)

  test("brute-force top-k: k rows per query, descending cosine, no self-match") {
    val k = 5
    val out = Ann.bruteTopK(embeds, queries, k).collect()
    assert(out.length == 8 * k)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to k))
      val cs = byRank.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"not sorted for q=$q")
      assert(rows.forall(_.getLong(2) != q))
    }
  }

  test("multi-table LSH recall@5 vs brute force is high (> 0.8)") {
    val k = 5
    def keyset(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = keyset(Ann.bruteTopK(embeds, queries, k))
    val lsh = keyset(Ann.lshNeighbors(embeds, queries, k))
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(s"multi-table LSH recall@5 = $recall")
    assert(recall > 0.8, s"recall too low: $recall")
  }

  test("IVF-flat: cells partition the corpus; recall@5 at nprobe=4/nlist=16 is usable") {
    val k = 5
    val cents = Ann.ivfCentroids(embeds, 16)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    def keyset(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = keyset(Ann.bruteTopK(embeds, queries, k))
    val ivf = keyset(Ann.ivfTopK(embeds, queries, k, nlist = 16, nprobe = 4))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"IVF recall@5 (nprobe=4/16) = $recall")
    assert(recall > 0.4, s"recall too low: $recall")
    // nprobe = nlist degenerates to exact search
    val full = keyset(Ann.ivfTopK(embeds, queries, k, nlist = 16, nprobe = 16))
    assert(full == brute, "probing all cells must equal brute force")
  }

  test("cosine_sim expression agrees with a plain SQL dot product") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), 0.0),
      (Array(1.0f, 2.0f, 2.0f), Array(1.0f, 2.0f, 2.0f), 1.0)
    ).toDF("a", "b", "expect")
    val bad = df.withColumn("got", graft.functions.cosine_sim(col("a"), col("b")))
      .filter(abs(col("got") - col("expect")) > 1e-12).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("cosine_sim is null on length mismatch or zero vector") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    assert(df.withColumn("c", graft.functions.cosine_sim(col("a"), col("b")))
      .filter(col("c").isNotNull).count() == 0)
  }
}
