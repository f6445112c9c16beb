package graft.datapipe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase

class TextStatsSpec extends AnyFunSuite with SparkTestBase {

  test("tokenCount handles spaces, blanks, CJK") {
    import spark.implicits._
    val cases = Seq(
      ("a b c", 3), ("  a   b  ", 2), ("", 0), ("   ", 0),
      ("one", 1), ("数据 表 扫描", 3))
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), TextStats.tokenCount(col("text"))).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    cases.foreach { case (t, n) => assert(got(t) == n, s"'$t'") }
  }

  test("langId identifies real multilingual samples") {
    import spark.implicits._
    val cases = Seq(
      ("the cat is in the house and it is very happy today", "en"),
      ("le chat est dans la maison et il regarde les oiseaux dehors", "fr"),
      ("el perro está en la casa y come una manzana roja", "es"),
      ("der hund ist in dem haus und er trinkt nicht viel wasser", "de"),
      ("数据表扫描和连接操作是查询引擎的核心部分", "zh"))
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), TextStats.langId(col("text"))).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, want) => assert(got(t) == want, s"'$t' → ${got(t)}") }
  }

  test("langId accuracy ≥ 0.95 on a deterministic 125-sentence multilingual corpus") {
    import spark.implicits._
    // Stopword-rich template vocab per language (diacritics disambiguate
    // the fr/es/de overlap); sentences are a fixed affine walk through the
    // vocab — deterministic, no RNG.
    val vocab = Map(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with", "for", "a",
        "house", "dog", "table", "day", "water"),
      "fr" -> Seq("le", "la", "les", "et", "de", "des", "est", "dans", "pour", "une",
        "maison", "chien", "jour", "très", "être"),
      "es" -> Seq("el", "la", "los", "las", "y", "de", "es", "en", "que", "una",
        "casa", "perro", "día", "agua", "muy"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "nicht",
        "haus", "hund", "tag", "wasser", "sehr"))
    val latin = for {
      (lang, words) <- vocab.toSeq
      i <- 0 until 25
    } yield (lang, (0 until 12).map(j => words((i * 7 + j * 5 + j * j) % words.size)).mkString(" "))
    val cjk = (0 until 25).map(i => ("zh", "数据表扫描连接查询引擎" * (1 + i % 3)))
    val rows = latin ++ cjk
    val got = rows.toDF("lang", "text")
      .select(col("lang"), TextStats.langId(col("text")).as("pred"))
      .collect()
    val acc = got.count(r => r.getString(0) == r.getString(1)).toDouble / got.length
    assert(acc >= 0.95, s"langId accuracy $acc; misses: " +
      got.filter(r => r.getString(0) != r.getString(1)).take(5).mkString(", "))
  }

  test("fixture documents.lang is a synthetic LABEL, not a text property (documented limit)") {
    // All fixture texts are drawn from one English-ish vocabulary regardless
    // of the lang column, so label-based accuracy is undefined there — this
    // pins that fact so the limitation stays documented and visible.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val preds = docs.select(TextStats.langId(col("text")).as("p"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "und")),
      s"fixture texts should classify en/und uniformly, got $preds")
    val labels = docs.select("lang").distinct().count()
    assert(labels >= 4) // the labels DO span languages — the texts don't
  }

  test("quality score ranks clean text above punctuation spam") {
    import spark.implicits._
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and runs away"),
      ("spam", "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~ ||| >>> <<<"),
      ("short", "hi"))
      .toDF("kind", "text")
    val out = TextStats.qualityFeatures(df, "text")
      .select("kind", "quality_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("clean") > out("spam"))
    assert(out("short") == 0.0)
  }

  test("corpus_pipeline: injected exact copies leave the report unchanged; gates bind") {
    import org.apache.spark.sql.expressions.Window
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.queries.Demos.queries("corpus_pipeline")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // Independent derivation over the ORIGINAL corpus only (no +100000
    // copies), with a structurally different collapse: group by the raw
    // text via a row_number window instead of the engine's
    // xxhash64-keyed min_by. Copy-injection must be invisible in the
    // report because every copy shares its original's text and a larger
    // doc_id, so the min-id representative is always the original.
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
    val gated = TextStats.qualityFeatures(d0, "text")
      .withColumn("lang_pred", TextStats.langId(col("text")))
      .filter(col("lang_pred") === "en" && col("quality_score") >= 0.5)
    val reps = gated
      .withColumn("rn", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy("text").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val want = reps.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        avg(col("quality_score")).as("avg_quality"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case ((s1, n1, t1, q1), (s2, n2, t2, q2)) =>
      assert(s1 == s2 && n1 == n2 && t1 == t2, s"$s1: ($n1,$t1) vs ($n2,$t2)")
      assert(math.abs(q1 - q2) < 1e-6, s"$s1 avg_quality $q1 vs $q2")
    }
    // non-vacuity: the gates reject some rows, and the pipeline saw real
    // duplicate groups (every original has an injected copy).
    assert(gated.count() < d0.count(), "quality/lang gates never bound")
    // the dup corpus fed 2× gated rows into the collapse; the report keeps
    // at most one per text — strictly fewer rows than the collapse consumed.
    assert(got.map(_._2).sum <= gated.count(), "dedup collapse never bound")
  }

  test("doc_fingerprint: deterministic; stable under suffix extension (min-window)") {
    import spark.implicits._
    import PipeFunctions._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(base, base, base + " trailing tail", "completely different words here")
      .toDF("text")
      .select(col("text"), doc_fingerprint(col("text"), lit(16)).as("fp")).collect()
    val fps = df.map(_.getLong(1))
    assert(fps(0) == fps(1))                 // deterministic
    assert(fps(2) <= fps(0))                 // superset of windows can only lower the min
    assert(fps(3) != fps(0))                 // different content → different fingerprint
  }
}
