package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all expressed as
  * codegen'd column expressions (no UDFs in the hot path): tokenization,
  * shingling, quality stats, a deterministic language-ID heuristic, simhash
  * and winnowing fingerprints. Everything is engine-portable: the same
  * computation is expressible in the DuckDB oracle where exactness matters.
  */
object TextOps {

  /** Word tokens: lowercased alphanumeric runs. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Whitespace token count (the cheap "how many words" metric). */
  def wsTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single symbols. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  // Set-construction steps are compiled single-pass UDFs rather than
  // higher-order-function expressions: Spark HOFs are CodegenFallback
  // (interpreted), so `element_at(regexp_extract_all(...), i)` inside a
  // transform() re-evaluates the regex PER ELEMENT (~300x per doc). The
  // UDFs implement exactly the semantics the DuckDB oracles state.

  private val TokenRe = "[a-z0-9]+".r

  private val shingles3Udf = udf((text: String) => {
    val tl = TokenRe.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toArray
    if (tl.length < 3) Array.empty[String]
    else tl.sliding(3).map(_.mkString(" ")).toArray.distinct
  })

  /** 3-token word shingles (distinct), the unit for MinHash/Jaccard dedup.
    * Takes the raw text column (tokenizes internally, one pass).
    */
  def shingles3OfText(text: Column): Column = shingles3Udf(text)

  private def charGramsUdf(n: Int) = udf((text: String) => {
    val lc = text.toLowerCase(java.util.Locale.ROOT)
    if (lc.length < n) Array.empty[String]
    else lc.sliding(n).toArray.distinct
  })

  /** Distinct character n-grams of the lowercased text. */
  def charGrams(c: Column, n: Int): Column = charGramsUdf(n)(c)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-language marker tokens for the language-ID heuristic. With real
    * multilingual text these are the usual high-frequency function words;
    * the heuristic machinery (score per language, deterministic argmax with
    * alphabetical tiebreak) is what the pipeline needs at scale.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "is"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "et", "une"))

  private def markerScore(tl: Column, markers: Seq[String]): Column =
    size(filter(tl, t => t.isin(markers.map(x => x: Any): _*))).cast("long")

  /** Deterministic language prediction: argmax of marker scores, ties broken
    * by language code ascending (expressed as an ordered >= cascade so the
    * SQL oracle can mirror it exactly).
    */
  def langId(tl: Column): Column = {
    val s = LangMarkers.map { case (l, m) => l -> markerScore(tl, m) }.toMap
    when(s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr"), "de")
      .when(s("en") >= s("es") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** 64-bit SimHash over a document's word tokens (weighted by term count):
    * per bit, sum +/-count by the bit of xxhash64(token), take the sign.
    * Pure column expressions -> whole-stage codegen; the 64 partial sums
    * ride one aggregation (map-side combined).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum((expr(s"(shiftright(h, $b) & 1) * 2 - 1") * col("cnt"))).as(s"s$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tf.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** Winnowing-style document fingerprints: xxhash64 of char 8-grams, min
    * per sliding window of 4, distinct mins = the fingerprint set
    * (Schleimer et al., SIGMOD'03 winnowing — public algorithm).
    */
  def fingerprints(c: Column): Column = {
    val hashes = transform(charGrams(c, 8), g => xxhash64(g))
    when(size(hashes) < 4, array_distinct(hashes))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(hashes) - 3),
        i => array_min(slice(hashes, i, lit(4))))))
  }
}
