package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.MinHash

/** Text-analysis functions for the training-data pipeline surface: language
  * ID, quality scoring, token counting, fingerprinting, shingling. All but
  * language-ID compose codegen'd built-ins (no UDFs in the hot path); the
  * n-gram language scorer is a scalar UDF over a small static profile table.
  */
object TextFunctions {

  /** Whitespace token count — matches `str(v).split()` semantics. */
  def token_count(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation,
    * the common pre-tokenizer regex family (GPT-2 style, simplified). */
  def subword_count(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character ratio over total length (0 for empty).
    * Java `\p{Punct}` == POSIX `[[:punct:]]` (ASCII punctuation), so the
    * DuckDB oracle can mirror this exactly. */
  def punct_ratio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, lit(0.0)).otherwise(punct.cast("double") / length(text))
  }

  private val stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is",
    "it", "on", "for", "with", "as", "at", "by", "or", "be", "this", "that")

  /** Fraction of tokens that are English stopwords — crude fluency signal. */
  def stopword_ratio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isin(stopwords.map(lit): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks))
  }

  /** Mean token length in characters. */
  def mean_token_len(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite [0,1] quality score: penalize very short/very long docs,
    * heavy punctuation, and zero stopwords (non-linguistic content). */
  def quality_score(text: Column): Column = {
    val n = token_count(text)
    val lenScore = when(n < 5, n.cast("double") / 5.0)
      .when(n > 5000, lit(0.5))
      .otherwise(lit(1.0))
    val punctScore = lit(1.0) - least(punct_ratio(text) * 2.0, lit(1.0))
    val stopScore = least(stopword_ratio(text) * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6)
  }

  /** Canonical document fingerprint: md5 of whitespace-normalized,
    * lowercased text. Stable across engines (md5 is standard). */
  def doc_fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles as an array column (for n-gram Jaccard dedup). */
  def word_shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val k = size(toks) - (n - 1)
    // n shifted slices zipped with concat — NOT a transform over indices:
    // a lambda body referencing the outer `toks` expression re-evaluates
    // the split per element (O(tokens²) per row); zip_with lambdas touch
    // only their arguments, so the split is evaluated a constant number
    // of times per row
    val slices = (0 until n).map(j => slice(toks, lit(j + 1), k))
    val joined = slices.reduce((a, b) =>
      zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(k <= 0, array(concat_ws(" ", toks))).otherwise(joined)
  }

  /** Character n-gram shingles (the classic MinHash dedup unit).
    * Same shifted-slice/zip_with construction as [[word_shingles]]: a
    * `substr(i, n)` lambda over positions would re-evaluate the
    * normalization regex per position — O(len²) per row. */
  def char_shingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val chars = split(norm, "")
    val k = length(norm) - (n - 1)
    val slices = (0 until n).map(j => slice(chars, lit(j + 1), k))
    val joined = slices.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, y)))
    when(k <= 0, array(norm)).otherwise(joined)
  }

  /** Exact Jaccard between two array columns (distinct semantics). */
  def array_jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val uni = size(array_union(ad, bd)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  // ---- language identification (n-gram heuristic) ----
  // Tiny static character-trigram profiles for a handful of languages; the
  // classifier scores a doc by stopword/character evidence. Deterministic,
  // no external model. For the synthetic corpus (shared vocabulary across
  // langs) it degrades gracefully to 'en'.
  // exposed so the oracle generator embeds the same marker table
  private[graft] val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to ", "ing ", " that "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", "sch", " nicht "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " que "),
    "es" -> Seq(" el ", " la ", " los ", " y ", " es ", " una ", " que ", "ción"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有")
  )

  private val langIdUdf = udf { (s: String) =>
    if (s == null || s.trim.isEmpty) "und"
    else {
      val t = " " + s.toLowerCase + " "
      // CJK codepoint share dominates if present
      val cjk = t.codePoints().filter(c => c >= 0x4e00 && c <= 0x9fff).count()
      if (cjk * 2 > t.length) "zh"
      else {
        // non-overlapping occurrence counts (replace-count semantics, so an
        // independent SQL engine can mirror via length deltas)
        val scores = langMarkers.map { case (lang, ms) =>
          lang -> ms.map { m =>
            var c = 0; var idx = t.indexOf(m)
            while (idx >= 0) { c += 1; idx = t.indexOf(m, idx + m.length) }
            c
          }.sum
        }
        // deterministic argmax: highest count, ties prefer 'en', then
        // lexicographic — a total order both engines can reproduce
        val (best, cnt) = scores.toSeq
          .sortBy { case (l, c) => (-c, if (l == "en") 0 else 1, l) }.head
        if (cnt == 0) "und" else best
      }
    }
  }

  /** `lang_id(text)`: heuristic language code ('en','de','fr','es','zh','und'). */
  def lang_id(text: Column): Column = langIdUdf(text)
}
