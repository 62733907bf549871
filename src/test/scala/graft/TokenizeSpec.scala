package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenize

class TokenizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(Tokenize.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("lowercase alnum runs, punctuation split, empties dropped") {
    assert(tok("Hello, World! x2") === Seq("hello", "world", "x2"))
    assert(tok("  leading trailing  ") === Seq("leading", "trailing"))
    assert(tok("...") === Seq.empty)
    assert(tok("") === Seq.empty)
  }

  test("property: tokens are nonempty [a-z0-9]+ runs equal to the UDF form") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // non-ASCII chars kept to lowercase-stable ones: locale-sensitive
    // case mappings (e.g. Turkish İ) legitimately differ between JVM
    // String.toLowerCase and Spark's UTF8String lower — the engine
    // tokenizes [a-z0-9] runs, so such chars are separators either way,
    // but the REFERENCE string comparison here would disagree
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '.', '!', '\n', '\t'),
      1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)
    val prop = forAll(gen) { s =>
      val t = tok(s)
      val reference = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      t.forall(_.matches("[a-z0-9]+")) && t == reference
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: native byte-scan tokens == the regex Column form incl. exotic case mappings") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // both sides run Spark's UTF8String lower, so the locale-sensitive
    // mappings the JVM-reference test above must avoid (KELVIN SIGN →
    // 'k', 'İ' → 'i'+combining dot — lowercase INTO the token
    // alphabet) are exactly comparable here, and are the interesting
    // cases: the native scan sees them only through lower()'s output
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '.', '!', '\n', '\t'),
      1 -> Gen.oneOf('é', 'ß', '中', 'Ñ', 'K', 'İ'))).map(_.mkString)
    val prop = forAll(gen) { s =>
      val both = Seq(s).toDF("text").select(
          Tokenize.tokens(col("text")).as("native"),
          filter(split(lower(col("text")), "[^a-z0-9]+"),
            t => t =!= lit("")).as("regex"))
        .as[(Seq[String], Seq[String])].head()
      both._1 == both._2
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(result.passed, result.status.toString)
  }

  test("per-language rules keep diacritic letters as token characters") {
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    // es: ñ and accented vowels are letters, not separators
    assert(tokL("El Ñandú corre, ñoño 42", "es")
      === Seq("el", "ñandú", "corre", "ñoño", "42"))
    // the ASCII rule splits the same text ON the diacritics
    assert(tok("El Ñandú corre") === Seq("el", "and", "corre"))
    // de: umlauts + ß
    assert(tokL("Straße GRÜN über", "de") === Seq("straße", "grün", "über"))
    // fr: accents, œ ligature, cedilla
    assert(tokL("Cœur déjà-vu, façade", "fr")
      === Seq("cœur", "déjà", "vu", "façade"))
    // unknown lang falls back to the ASCII rule
    assert(tokL("añb", "xx") === Seq("a", "b"))
  }

  test("zh: character bigrams over ideograph runs, ASCII runs pass through") {
    def cjk(s: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.cjkTokens(col("text")).as("t"))
        .as[Seq[String]].head()
    assert(cjk("大数据") === Seq("大数", "数据"))
    assert(cjk("中") === Seq("中"))           // lone ideograph: itself
    assert(cjk("Spark大数据引擎Test42")
      === Seq("spark", "大数", "数据", "据引", "引擎", "test42"))
    assert(cjk("no cjk at all") === Seq("no", "cjk", "at", "all"))
    assert(cjk("") === Seq.empty)
    // static zh rule and the column dispatch both route to bigrams
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    assert(tokL("大数据x", "zh") === Seq("大数", "数据", "x"))
    val byCol = Seq(("大数据", "zh"), ("大数据", "en")).toDF("text", "lang")
      .select(Tokenize.tokensByLang(col("text"), col("lang")).as("t"))
      .as[Seq[String]].collect()
    assert(byCol(0) === Seq("大数", "数据"))
    assert(byCol(1) === Seq.empty) // en rule: ideographs are separators
  }

  test("ru: Cyrillic letters are token characters, ё included, case folds") {
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    assert(tokL("Привет МИР, обработка данных 42", "ru")
      === Seq("привет", "мир", "обработка", "данных", "42"))
    // ё sits OUTSIDE the contiguous а-я range (U+0451 vs U+0430-044F):
    // a class without it would split ёж and ёлка mid-word
    assert(tokL("Ёлка и ёж", "ru") === Seq("ёлка", "и", "ёж"))
    // mixed latin/cyrillic stays one run under the ru class
    assert(tokL("spark-движок v2", "ru") === Seq("spark", "движок", "v2"))
    // the ASCII rule treats Cyrillic as separators
    assert(tok("Привет x42 мир") === Seq("x42"))
  }

  test("ja: script bigrams over Han+kana runs, prolonged mark stays in-word") {
    def ja(s: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.jaTokens(col("text")).as("t"))
        .as[Seq[String]].head()
    // katakana word with the prolonged-sound mark ー: one run, bigrams
    assert(ja("データ") === Seq("デー", "ータ"))
    // kanji + hiragana form ONE script run (the ja class spans both)
    assert(ja("日本語のx") === Seq("日本", "本語", "語の", "x"))
    assert(ja("あ") === Seq("あ"))    // lone kana: itself
    assert(ja("Spark処理2026") === Seq("spark", "処理", "2026"))
    // the zh rule does NOT know kana — katakana is a separator there
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    assert(tokL("データ処理", "zh") === Seq("処理"))
    assert(tokL("データ処理", "ja") === Seq("デー", "ータ", "タ処", "処理"))
    // column dispatch routes ja rows to the ja rule
    val byCol = Seq(("データ", "ja"), ("データ", "zh"), ("データ", "en"))
      .toDF("text", "lang")
      .select(Tokenize.tokensByLang(col("text"), col("lang")).as("t"))
      .as[Seq[String]].collect()
    assert(byCol(0) === Seq("デー", "ータ"))
    assert(byCol(1) === Seq.empty)
    assert(byCol(2) === Seq.empty)
  }

  test("ko: Hangul script bigrams, compatibility jamo runs survive") {
    def ko(s: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.koTokens(col("text")).as("t"))
        .as[Seq[String]].head()
    // an eojeol is one script run → sliding bigrams
    assert(ko("한국어") === Seq("한국", "국어"))
    // spaces separate eojeol: runs bigram independently
    assert(ko("형태소 분석") === Seq("형태", "태소", "분석"))
    assert(ko("한") === Seq("한"))        // lone syllable: itself
    // compatibility jamo (ㅋㅋㅋ laughter) is real text, same rule
    assert(ko("ㅋㅋㅋ") === Seq("ㅋㅋ", "ㅋㅋ"))
    // mixed script: ASCII runs pass through as single tokens
    assert(ko("Spark처리 2026") === Seq("spark", "처리", "2026"))
    // the zh/ja rules do NOT know Hangul — it is a separator there
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    assert(tokL("한국어処理", "zh") === Seq("処理"))
    assert(tokL("한국어処理", "ko") === Seq("한국", "국어"))
  }

  test("ar: diacritics and tatweel are stripped, never separators") {
    def ar(s: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.arTokens(col("text")).as("t"))
        .as[Seq[String]].head()
    // the diacritized and bare forms are the SAME token — stripping
    // tashkeel must not split the host word
    assert(ar("مُعَالَجَةُ") === ar("معالجة"))
    assert(ar("مُعَالَجَةُ").length === 1)
    // tatweel elongation normalizes away inside the word
    assert(ar("بـــيانات") === Seq("بيانات"))
    // mixed script + digits: ASCII rule coexists
    assert(ar("Spark معالجة 2026") === Seq("spark", "معالجة", "2026"))
    // shadda/sukun (U+0651/U+0652, the range's far end) also strip
    assert(ar("الضَّخْمَة") === Seq("الضخمة"))
    // under the en rule Arabic letters are separators — dispatch matters
    def tokL(s: String, lang: String): Seq[String] =
      Seq(s).toDF("text").select(Tokenize.tokens(col("text"), lang).as("t"))
        .as[Seq[String]].head()
    assert(tokL("معالجة 42", "en") === Seq("42"))
    assert(tokL("معالجة 42", "ar") === Seq("معالجة", "42"))
  }

  test("property: ko and ar Column rules equal the JVM reference") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val genKo = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('한', '국', '어', '형', '태', '소', 'ㅋ', '분', '석'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '.', '!', '\n'))).map(_.mkString)
    val genAr = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('م', 'ع', 'ا', 'ل', 'ج', 'ة', 'ب', 'ي', 'ن', 'ت'),
      2 -> Gen.oneOf('ً', 'ِ', 'ّ', 'ْ', 'ـ'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '.', '!', '\n'))).map(_.mkString)
    for ((gen, lang) <- Seq((genKo, "ko"), (genAr, "ar"))) {
      val prop = forAll(gen) { s =>
        val viaCol = Seq(s).toDF("text")
          .select(Tokenize.tokens(col("text"), lang).as("t"))
          .as[Seq[String]].head()
        viaCol == Tokenize.tokensLangRef(s, lang).toSeq
      }
      val result = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
      assert(result.passed, s"$lang: ${result.status}")
    }
  }

  test("property: ru and ja Column rules equal the JVM reference") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val genRu = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('п', 'р', 'и', 'в', 'е', 'т', 'ё', 'Я', 'Ж'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '.', '!', '\n'))).map(_.mkString)
    val genJa = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('日', '本', '語', 'の', 'あ', 'デ', 'ー', 'タ', '処', '理'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '、', '。', '!', '\n'))).map(_.mkString)
    for ((gen, lang) <- Seq((genRu, "ru"), (genJa, "ja"))) {
      val prop = forAll(gen) { s =>
        val viaCol = Seq(s).toDF("text")
          .select(Tokenize.tokens(col("text"), lang).as("t"))
          .as[Seq[String]].head()
        viaCol == Tokenize.tokensLangRef(s, lang).toSeq
      }
      val result = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
      assert(result.passed, s"$lang: ${result.status}")
    }
  }

  test("property: native RuleTokens equals each regex Column form (es/de/fr/ru)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // the native char-scan rules replaced filter(split(lower, ...))
    // per class (round-17 verdict ask #6) — pin EXACT equality against
    // the regex forms themselves, both sides through Spark's lower(),
    // including uppercase class letters and the exotic mappings
    // (KELVIN → 'k', İ → 'i'+combining dot)
    for ((lang, cls) <- Tokenize.langLetters if lang != "en") {
      val classChars = cls.replace("a-z", "az").replace("0-9", "09")
        .replace("а-я", "аяб").toSeq
      val gen = Gen.listOf(Gen.frequency(
        4 -> Gen.oneOf(classChars),
        3 -> Gen.alphaNumChar,
        2 -> Gen.oneOf(' ', ',', '.', '!', '\n', 'Ñ', 'Ж', 'K', 'İ', '中')))
        .map(_.mkString)
      val prop = forAll(gen) { s =>
        val both = Seq(s).toDF("text").select(
            Tokenize.tokens(col("text"), lang).as("native"),
            filter(split(lower(col("text")), s"[^$cls]+"),
              t => t =!= lit("")).as("regex"))
          .as[(Seq[String], Seq[String])].head()
        both._1 == both._2
      }
      val result = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
      assert(result.passed, s"$lang: ${result.status}")
    }
  }

  test("property: native script-bigram and ar rules equal the old regex chains") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // the pre-round-18 Column forms, verbatim: regexp_extract_all +
    // HOF bigrams for the script rules, regexp_replace + split for ar
    def regexBigrams(c: org.apache.spark.sql.Column, range: String) = {
      val segs = regexp_extract_all(lower(c), lit(s"[a-z0-9]+|[$range]+"), lit(0))
      flatten(transform(segs, s =>
        when(s.rlike(s"^[$range]") && length(s) >= 2,
          transform(sequence(lit(1), length(s) - 1), i => s.substr(i, lit(2))))
          .otherwise(array(s))))
    }
    def regexAr(c: org.apache.spark.sql.Column) =
      filter(split(regexp_replace(lower(c), s"[${Tokenize.ArDiacritics}]", ""),
        s"[^a-z0-9${Tokenize.ArLetters}]+"), t => t =!= lit(""))
    val gen = Gen.listOf(Gen.frequency(
      3 -> Gen.oneOf('大', '数', '据', '日', '本', 'デ', 'ー', '한', '국', 'ㅋ'),
      2 -> Gen.oneOf('م', 'ع', 'ا', 'ل', 'ة', 'ً', 'ّ', 'ـ'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '。', '!', '\n', 'K', 'İ'))).map(_.mkString)
    val cases = Seq(
      ("zh", Tokenize.cjkTokens _, regexBigrams(_: org.apache.spark.sql.Column, Tokenize.CjkRange)),
      ("ja", Tokenize.jaTokens _, regexBigrams(_: org.apache.spark.sql.Column, Tokenize.JaRange)),
      ("ko", Tokenize.koTokens _, regexBigrams(_: org.apache.spark.sql.Column, Tokenize.KoRange)),
      ("ar", Tokenize.arTokens _, regexAr _))
    for ((lang, native, regex) <- cases) {
      val prop = forAll(gen) { s =>
        val both = Seq(s).toDF("text").select(
            native(col("text")).as("native"), regex(col("text")).as("regex"))
          .as[(Seq[String], Seq[String])].head()
        both._1 == both._2
      }
      val result = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
      assert(result.passed, s"$lang: ${result.status}")
    }
  }

  test("tokensByLang dispatches on the lang column") {
    val df = Seq(("ñoño", "es"), ("ñoño", "en")).toDF("text", "lang")
      .select(Tokenize.tokensByLang(col("text"), col("lang")).as("t"))
      .as[Seq[String]].collect()
    assert(df(0) === Seq("ñoño"))
    assert(df(1) === Seq("o", "o")) // ñ is a separator under the en rule
  }

  test("property: zh Column rule equals the JVM reference on mixed CJK/ASCII") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('大', '数', '据', '处', '理', '引', '擎', '中', '文'),
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '。', '!', '\n'))).map(_.mkString)
    val prop = forAll(gen) { s =>
      val viaCol = Seq(s).toDF("text")
        .select(Tokenize.cjkTokens(col("text")).as("t"))
        .as[Seq[String]].head()
      viaCol == Tokenize.tokensLangRef(s, "zh").toSeq
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }

  test("graft_tokens_lang SQL function equals the Column dispatch (incl. zh)") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("大数据Spark引擎", "zh"), ("Ñoño 42", "es"), ("Ñoño 42", "en"))
      .toDF("text", "lang")
    df.createOrReplaceTempView("graft_tl")
    val viaSql = spark.sql("SELECT graft_tokens_lang(text, lang) AS t FROM graft_tl")
      .collect().map(_.getSeq[String](0).toList).toSeq
    val viaCol = df.select(Tokenize.tokensByLang(col("text"), col("lang")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql.head === Seq("大数", "数据", "spark", "引擎"))
  }

  test("shingles: n-grams in order; short docs yield empty") {
    def sh(words: Seq[String], n: Int): Seq[String] =
      Seq(Tuple1(words)).toDF("toks")
        .select(Tokenize.shingles(col("toks"), n).as("s"))
        .as[Seq[String]].head()
    assert(sh(Seq("a", "b", "c", "d"), 3) === Seq("a b c", "b c d"))
    assert(sh(Seq("a", "b"), 3) === Seq.empty)
    assert(sh(Seq("a", "b", "c"), 3) === Seq("a b c"))
  }
}
