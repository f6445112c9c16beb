package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, language ID,
  * quality scoring, fingerprinting. All Catalyst built-ins except the
  * rolling fingerprint (one custom expression). */
object TextStats {

  /** Whitespace token count (0 for empty/blank). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: tokens split further at letter/digit/punct
    * boundaries — a cheap, deterministic proxy for tokenizer cost. */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text),
        "\\s+|(?<=[\\p{L}])(?=[\\p{N}])|(?<=[\\p{N}])(?=[\\p{L}])|(?=[\\p{Punct}])")))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with", "for", "a"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "est", "dans", "pour", "une"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "es", "en", "que", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "nicht"))

  /** Heuristic language ID: CJK codepoint share decides zh; otherwise the
    * language whose stopword list hits the most tokens (ties → more
    * diacritic evidence → en default). Returns a lang code column. */
  def langId(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val hits = stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(array_distinct(toks), typedLit(words)))
    }
    val cjkShare = (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0d))
    val frD = length(text) - length(regexp_replace(text, "[àâçéèêëîïôùûœ]", ""))
    val esD = length(text) - length(regexp_replace(text, "[áéíóúñ¿¡]", ""))
    val deD = length(text) - length(regexp_replace(text, "[äöüß]", ""))
    when(cjkShare > 0.15, lit("zh"))
      .when(hits("fr") + frD > hits("en") && hits("fr") + frD >= hits("es") + esD &&
        hits("fr") + frD >= hits("de") + deD && (hits("fr") + frD) > 0, lit("fr"))
      .when(hits("es") + esD > hits("en") && hits("es") + esD >= hits("de") + deD &&
        (hits("es") + esD) > 0, lit("es"))
      .when(hits("de") + deD > hits("en") && (hits("de") + deD) > 0, lit("de"))
      .when(hits("en") > 0, lit("en"))
      .otherwise(lit("und")) // undetermined
      .as("lang_pred")
  }

  /** Quality features + composite score for filtering. All components are
    * deterministic column expressions over one pass of the text. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val punct = length(regexp_replace(t, "[^\\p{Punct}]", ""))
    val upper = length(regexp_replace(t, "[^A-Z]", ""))
    val stopHits = size(array_intersect(array_distinct(split(trim(lower(t)), "\\s+")),
      typedLit(stopwords("en"))))
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("mean_token_len",
        when(nTokens > 0, nChars.cast("double") / nTokens.cast("double")).otherwise(lit(0.0d)))
      .withColumn("punct_ratio",
        punct.cast("double") / greatest(nChars.cast("double"), lit(1.0d)))
      .withColumn("upper_ratio",
        upper.cast("double") / greatest(nChars.cast("double"), lit(1.0d)))
      .withColumn("stopword_hits", stopHits)
      .withColumn("quality_score",
        when(nTokens < 5, lit(0.0d)).otherwise(
          lit(1.0d)
            - least(col("punct_ratio") * 2, lit(0.5d))
            - least(col("upper_ratio"), lit(0.3d))
            + least(col("stopword_hits").cast("double") * 0.02d, lit(0.2d))))
  }
}
