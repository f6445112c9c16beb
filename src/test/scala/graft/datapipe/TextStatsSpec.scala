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
