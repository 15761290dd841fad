package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring, and n-gram-profile
  * language identification. All pure scan-side Column expressions —
  * codegen'd, zero shuffle, linear in corpus bytes: the only shape that
  * matters at 100 TB, where these run as a single pass fused into the
  * parquet scan (verify: one WholeStageCodegen span over the scan).
  */
object TextStats {

  /** BPE-ish token pattern: letter runs | digit runs | single non-space
    * symbol. Same regex dialect subset in Java (Spark) and RE2 (DuckDB).
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Whitespace token count. */
  def nTokens(text: Column): Column = size(TextHash.tokens(text))

  /** BPE-ish token count (regex extraction, letter/digit/symbol classes). */
  def nBpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  /** Per-language stopword profiles for the lang-id heuristic. Order is
    * the tie-break priority (first profile wins ties) — keep stable, it is
    * part of the declared semantics.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "en"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不"))

  /** Stopword-hit count for one profile over a token array. */
  def profileScore(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => t.isin(profile.map(_.asInstanceOf[Any]): _*)))

  /** Predicted language: argmax of profile scores, first-profile-wins on
    * ties (expressed as a first-match CASE so the identical expression
    * runs in any ANSI engine).
    */
  def langId(toks: Column): Column = {
    val scores = LangProfiles.map { case (lang, prof) =>
      lang -> profileScore(toks, prof)
    }
    val cases = scores.map { case (lang, s) =>
      val geAll = scores.map(_._2).map(o => s >= o).reduce(_ && _)
      (geAll, lit(lang))
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), acc) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** DuckDB mirror of one profile's [[profileScore]], generated from
    * [[LangProfiles]] (review finding: hand-rolled copies in two query
    * packs would silently miss a profile addition). Expects the token
    * list in scope as `w`.
    */
  def langScoreDuck(lang: String): String = {
    val prof = LangProfiles.find(_._1 == lang).getOrElse(
      throw new IllegalArgumentException(s"unknown lang profile: $lang"))
      ._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(w, t -> list_contains($prof, t)))"
  }

  /** DuckDB mirror of [[langId]]'s first-match argmax CASE over
    * `s_<lang>` columns, generated in profile order so the tie-break
    * and the language set can never drift from the engine's.
    */
  def langArgmaxCaseDuck: String = {
    val langs = LangProfiles.map(_._1)
    val whens = langs.map { l =>
      val geAll = langs.filterNot(_ == l).map(o => s"s_$l >= s_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  /** Sum of token lengths (for mean-token-length quality signals). */
  def totalTokenChars(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Composite quality score in [0,1]-ish: rewards mid-length tokens and
    * stopword presence, penalizes symbol density. Deterministic double
    * arithmetic, same operand order as the DuckDB mirror.
    */
  def qualityScore(text: Column): Column = {
    val toks = TextHash.tokens(text)
    val n = size(toks).cast("double")
    val avgLen = totalTokenChars(toks).cast("double") / n
    val stopRatio =
      profileScore(toks, LangProfiles.head._2).cast("double") / n
    val symRatio =
      size(regexp_extract_all(text, lit("[^A-Za-z0-9 ]"), lit(0)))
        .cast("double") / length(text).cast("double")
    // mid-length sweet spot around 4.5 chars; clamp at 0
    greatest(lit(0d),
      lit(1d) - abs(avgLen - 4.5d) / 4.5d) * lit(0.5d) +
      least(stopRatio * 2d, lit(1d)) * lit(0.3d) +
      greatest(lit(0d), lit(1d) - symRatio * 5d) * lit(0.2d)
  }
}
