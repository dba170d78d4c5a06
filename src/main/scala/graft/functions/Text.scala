package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, quality signals, language-ID heuristics and
  * order-sensitive document fingerprints.
  *
  * Everything here is a pure Column expression (codegen'd, no UDFs) so a
  * 100 TB corpus pays only a projection — no shuffle, no python workers.
  * Where a query needs a DuckDB oracle, the expression is chosen so the
  * identical computation is expressible in ANSI-ish SQL on the other side.
  */
object Text {

  /** Whitespace tokenization (the corpora are single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: letter runs, digit runs, single other
    * non-space symbols — a cheap stand-in for subword tokenizers.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  private def stopArray: Column = array(StopWords.map(lit): _*)

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stopArray, t)))
        .cast("double") / size(toks).cast("double"))

  /** Mean token length (0 when empty). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(toks).cast("double"))

  /** Composite quality score in [0,1]: length band + stopword presence +
    * mean token length band. Deliberately simple and SQL-portable.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenOk = when(size(t).between(20, 1000), 0.4).otherwise(0.0)
    val stopOk = when(stopwordRatio(t) > 0.01, 0.3).otherwise(0.0)
    val mtl = meanTokenLen(t)
    val mtlOk = when(mtl.between(2.0, 12.0), 0.3).otherwise(0.0)
    round(lenOk + stopOk + mtlOk, 6)
  }

  /** Marker-token language-ID heuristic: count hits per language's marker
    * set, predict the argmax (ties broken by fixed order), 'und' when no
    * marker hits. On real corpora the marker sets would be per-language
    * stopword lists; the mechanism (portable scoring + argmax CASE) is
    * what the operator contributes.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("la", "el", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de5", "shi4", "le5"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))

  def langId(text: Column): Column = {
    val t = tokens(text)
    val scores = LangMarkers.map { case (l, m) => l -> langScore(t, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declaration order) attaining a positive max wins;
    // folding in reverse makes earlier entries override later ones.
    scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Order-sensitive positional fingerprint: sum over tokens of
    * (1-based position) × (31·len(token) + ascii(first char)), mod 1e9+7.
    * A permutation of the same tokens fingerprints differently (unlike a
    * bag-of-words hash), and the arithmetic is exactly reproducible in
    * DuckDB (`list_transform` with 1-based lambda index + `list_sum`).
    */
  def positionalFingerprint(toks: Column): Column =
    pmod(
      aggregate(
        zip_with(toks, sequence(lit(1), greatest(size(toks), lit(1))),
          (t, i) => i.cast("long") *
            (lit(31L) * length(t).cast("long") + ascii(t).cast("long"))),
        lit(0L), (acc, x) => acc + coalesce(x, lit(0L))),
      lit(1000000007L))

  /** Word n-gram shingles joined with spaces; documents shorter than `n`
    * tokens yield an empty shingle set.
    */
  def shingles(toks: Column, n: Int): Column =
    // one codegen'd static pass; byte-identical to the HOF form
    // `transform(sequence, i => concat_ws(" ", slice(toks, i, n)))` it
    // replaces (see ArrayOps.ngramStrings for the measured why)
    ArrayOps.ngramStringsF(toks, n)

  /** Canonical text normalization for dedup/quality pipelines: lowercase,
    * strip everything but letters/digits/spaces, collapse whitespace
    * runs, trim. Regexes use only class syntax shared by Java and RE2-ish
    * engines, so the exact transform is reproducible in SQL oracles.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** PII scrubbing: masks email addresses, then long digit runs (7+ —
    * phone/account numbers), in that order so the email's local part
    * doesn't survive as digits. Patterns are deliberately simple and
    * engine-portable; a production scrubber would add locale-specific
    * passes on top of the same projection shape.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")
}
