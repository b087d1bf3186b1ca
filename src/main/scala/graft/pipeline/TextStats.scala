package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document fingerprinting.
  * All are pure narrow projections (no shuffle): they scale linearly with
  * input partitions and stay inside whole-stage codegen (built-in functions
  * only, no UDFs).
  */
object TextStats {

  /** Whitespace word tokens of a text column (codegen'd, shuffle-free). */
  def words(text: Column): Column = filter(split(text, " ", -1), w => w =!= "")

  /** Token counts: whitespace tokenizer + a BPE-ish subword estimate
    * (≈ chars/4 per the common "1 token ≈ 4 chars" rule, counted exactly
    * as ceil(n_chars/4) so the oracle is integer-exact).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).as("n_words"),
      ((length(col("text")) + lit(3)) / lit(4)).cast("long").as("n_subword_est"))

  /** Quality signals as exact integer counts (length, punctuation,
    * stopwords, digits) — integer outputs make the cross-engine oracle
    * comparison exact, no float drift.
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val stop = array(Seq("the", "a", "of", "to", "and", "in", "is").map(lit): _*)
    val t = col("text")
    docs.select(
      col("doc_id"),
      length(t).as("n_chars"),
      size(words(t)).as("n_words"),
      (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).as("n_punct"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("n_digits"),
      size(filter(words(t), w => array_contains(stop, w))).as("n_stopwords"))
  }

  /** Language ID by stopword-hit counting per candidate language —
    * the classic n-gram/wordlist heuristic, deterministic tie-break by
    * fixed language order. Pure projection; at 100 TB this is a single
    * narrow pass.
    */
  val LangWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and"),
    "de" -> Seq("der", "die", "und", "das", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "une"),
    "es" -> Seq("el", "los", "y", "una", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(docs: DataFrame): DataFrame = {
    val w = words(lower(col("text")))
    val hits = LangWords.map { case (lang, ws) =>
      val arr = array(ws.map(lit): _*)
      lang -> size(filter(w, x => array_contains(arr, x)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in fixed order) achieving the max; all-zero -> "und"
    val pred = hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h === best && best > lit(0), lit(lang)).otherwise(acc)
    }
    val outCols = col("doc_id") +:
      (hits.map { case (l, h) => h.as(s"hits_$l") } :+ pred.as("pred_lang"))
    docs.select(outCols: _*)
  }

  /** 64-bit rolling polynomial fingerprint of the text via the custom
    * codegen Expression (graft.functions.RollingHash) — the document-
    * fingerprinting primitive (content-defined dedup keys, shingle anchors).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.rolling_hash(col("text")).as("fingerprint"))
}
