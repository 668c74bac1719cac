package graft

import org.apache.spark.sql.functions._

import graft.textops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("token count / stopword hits / punct on known strings") {
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog."),
      (2L, "der die das und ist!"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.stopwordHits(col("text"), TextOps.StopEn).as("en"),
      TextOps.stopwordHits(col("text"), TextOps.StopDe).as("de"),
      TextOps.punctChars(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ((9, 2, 0, 1)))  // "The" + "the"; one '.'
    assert(out(2L) == ((5, 0, 4, 1)))  // "ist!" is not a bare stopword token
    assert(out(3L) == ((1, 0, 0, 0)))
  }

  test("langId votes correctly and falls back to 'und'") {
    val df = Seq(
      ("the cat is in the house", "en"),
      ("der hund ist nicht das problem", "de"),
      ("le chat est une merveille", "fr"),
      ("zzz qqq www", "und")
    ).toDF("text", "expect")
    val bad = df.withColumn("got", TextOps.langId(col("text")))
      .filter(col("got") =!= col("expect")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("quality score is bounded [0,1] over the corpus") {
    val qs = docs.select(TextOps.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(qs.getDouble(0) >= 0.0 && qs.getDouble(1) <= 1.0)
  }

  test("scaled4 fixed-point: exact half-cases round up deterministically") {
    import spark.implicits._
    val vals = Seq(0.86875, 0.5, 0.12344999, 0.99995).toDF("x")
      .select(TextOps.scaled4(col("x")).as("s")).as[Int].collect().toSeq
    assert(vals == Seq(8687, 5000, 1234, 10000) || vals == Seq(8688, 5000, 1234, 10000))
    // whichever way the double for .86875 lands, it is ONE deterministic
    // IEEE sequence shared with the SQL oracle — that is the contract.
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq("A  b\tc", "a b c", "a b d").toDF("text")
      .select(TextOps.fingerprint(col("text")).as("fp")).as[String].collect()
    assert(df(0) == df(1) && df(1) != df(2))
  }

  test("bpeSegment applies merges in rank order with one-pass adjacent rewrites") {
    import spark.implicits._
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n")
    val out = Seq((1L, "the then bathe thth in")).toDF("doc_id", "text")
      .select(graft.textops.TextOps.bpeSegment(col("text"), merges).as("s"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toList)
    assert(out(0) == Seq("the"))            // t+h then th+e chain
    assert(out(1) == Seq("the", "n"))       // no e+n merge
    assert(out(2) == Seq("b", "a", "the"))  // rank order: t+h before a+n? a is not adjacent n
    // the fence property: BOTH adjacent t-h pairs merge in ONE pass
    assert(out(3) == Seq("th", "th"))
    assert(out(4) == Seq("in"))
  }

  test("trainBpe learns hand-computable merges and roundtrips through bpeSegment") {
    import spark.implicits._
    val d = Seq((1L, "the the the"), (2L, "then")).toDF("doc_id", "text")
    // pairs: (t,h)=4, (h,e)=4, (e,n)=1 → tie breaks pair-ASC → (h,e) first;
    // then (t,he)=4; then only (the,n)=1 < minCount → early stop
    val merges = graft.textops.TextOps.trainBpe(d, numMerges = 5)
    assert(merges == Seq("h" -> "e", "t" -> "he"))
    val seg = Seq((1L, "then zap")).toDF("doc_id", "text")
      .select(graft.textops.TextOps.bpeSegment(col("text"), merges).as("s"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toList)
    assert(seg(0) == Seq("the", "n"))
    assert(seg(1) == Seq("z", "a", "p"))
  }

  test("compressionRatio: boilerplate compresses far below prose; empty is null") {
    import spark.implicits._
    val d = Seq(
      (1L, "ACCEPT COOKIES " * 200),
      (2L, "The committee's findings, released after an eighteen-month " +
        "inquiry, traced the outage to a misconfigured failover path that " +
        "had silently shadowed production traffic since the spring rollout."),
      (3L, "")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      graft.textops.TextOps.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out(3L).isEmpty)
    val (boiler, prose) = (out(1L).get, out(2L).get)
    assert(boiler < prose / 5,
      s"repetition must compress far below prose: $boiler vs $prose")
    assert(prose > 3000 && prose < 10000, s"prose ratio sane: $prose")
    // determinism: fixed config → identical value on re-evaluation
    val again = d.where(col("doc_id") === 1)
      .select(graft.textops.TextOps.compressionRatio(col("text")))
      .head().getInt(0)
    assert(again == boiler)
  }

  test("stats frame has one row per doc and no null metrics") {
    val s = TextOps.stats(docs)
    assert(s.count() == docs.count())
    assert(s.filter(col("n_tokens").isNull || col("quality_e4").isNull ||
      col("lang").isNull).count() == 0)
  }
}
