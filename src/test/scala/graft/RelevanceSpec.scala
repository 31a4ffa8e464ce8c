package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relevance

/** BM25 + unigram cross-entropy: semantics on a hand-computable fixture
  * plus the edge cases the operators guard (mixed-case/punctuated query
  * terms, empty term lists, empty corpora).
  */
class RelevanceSpec extends AnyFunSuite with SparkTest {
  import org.apache.spark.sql.DataFrame

  private def corpus(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25 ranks the term-dense doc first and idf kills ubiquitous terms") {
    val docs = corpus(
      1L -> "spark spark spark engine",
      2L -> "spark engine engine engine",
      3L -> "engine engine engine engine")
    val r = Relevance.bm25(docs, Seq("spark"), topK = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.map(_._1).toSeq === Seq(1L, 2L), "tf ordering broken")
    assert(r(0)._2 > r(1)._2)
    // a term present in EVERY doc still has positive idf under the +1 form
    val all = Relevance.bm25(docs, Seq("engine"), topK = 10).collect()
    assert(all.length === 3 && all.forall(_.getDouble(1) > 0.0))
  }

  test("query terms are normalized through the document tokenizer") {
    val docs = corpus(1L -> "hello world", 2L -> "goodbye world")
    // "Hello" (case) and "wor-ld!" (punctuation) must still match
    val r = Relevance.bm25(docs, Seq("HELLO!"), topK = 10).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L))
    assertThrows[IllegalArgumentException] {
      Relevance.bm25(docs, Seq("!!!", ""), topK = 10)
    }
  }

  test("empty corpus yields empty results, not an NPE") {
    val empty = corpus().filter(lit(false))
    assert(Relevance.bm25(empty, Seq("x")).count() === 0)
    assert(Relevance.unigramCrossEntropy(empty).count() === 0)
  }

  test("cross-entropy is lower for typical docs than for rare-token docs") {
    val docs = corpus(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the rug",
      3L -> "zyx qwv jkl pqr xxj zzq")
    val h = Relevance.unigramCrossEntropy(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(h(3L) > h(1L) && h(3L) > h(2L),
      s"rare-token doc should score highest entropy: $h")
  }

  test("xent plan has no forced vocabulary broadcast") {
    val docs = corpus(1L -> "a b c", 2L -> "a b d")
    val plan = Relevance.unigramCrossEntropy(docs)
      .queryExecution.logical.toString
    assert(!plan.contains("ResolvedHint"),
      "LM side must not be hint-broadcast (vocabulary-sized at web scale)")
  }

  test("bigram xent flags shuffled token order that unigram xent cannot see") {
    // docs 1-3 share the same unigram distribution of "the cat sat"-style
    // text; doc 4 uses the same TOKENS but scrambled order — unigram xent
    // ties it with the natural docs, bigram xent must score it higher
    val docs = corpus(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "the cat sat on the mat",
      4L -> "mat the on sat cat the")
    val h1 = Relevance.unigramCrossEntropy(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(h1(4L) == h1(1L), "same bag of words must tie under unigrams")
    val h2 = Relevance.bigramCrossEntropy(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(h2(4L) > h2(1L),
      s"scrambled doc should score higher bigram entropy: $h2")
  }

  test("bigram xent drops sub-2-token docs and survives an empty corpus") {
    val docs = corpus(1L -> "one", 2L -> "two tokens here")
    val r = Relevance.bigramCrossEntropy(docs).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L))
    val empty = corpus().filter(lit(false))
    assert(Relevance.bigramCrossEntropy(empty).count() === 0)
  }
}
