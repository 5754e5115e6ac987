package graft

import graft.ext.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the unigram-LM tokenizer contracts the q_unigram_* oracles
  * mirror: the census/top-V/required-character vocabulary rule, the
  * packed (cost·64 + pieces) Viterbi metric, the unknown-word path,
  * and the hard-EM count/required-character invariants. */
class UnigramSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("unigramSeed: every single character survives; top-V order is " +
      "(cnt DESC, piece)") {
    val d = docs((1L, "abab abab cd"), (2L, "abab cd cd"))
    val vocab = Unigram.unigramSeed(d, "text", maxPieceLen = 2,
      vocabSize = 3, maxWordLen = 16).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // singles a, b, c, d always present
    assert(Set("a", "b", "c", "d").subsetOf(vocab.keySet))
    // census: "abab"×3 -> a:6 b:6 ab:9(two per word... ) recompute:
    // per "abab": a@1,a@3 b@2,b@4 ab@1,ab@3 ba@2 -> freq 3 words
    // pieces: ab cnt 6, ba cnt 3, a 6, b 6; "cd": c 3, d 3, cd 3
    assert(vocab("ab")._1 == 6L && vocab("a")._1 == 6L)
    // top-3 under (cnt DESC, piece): a(6), ab(6), b(6) — ba(3) excluded
    assert(!vocab.contains("ba"))
    // cost monotone: higher count never costs more
    val byCnt = vocab.values.toSeq.sortBy(_._1)
    assert(byCnt.zip(byCnt.tail).forall { case ((c1, k1), (c2, k2)) =>
      c1 > c2 || k1 >= k2 })
  }

  test("unigramEncode: picks multi-char pieces when cheaper, counts " +
      "and costs add per word") {
    val d = docs((1L, "abab"), (2L, "abab abab"))
    val vocab = Unigram.unigramSeed(d, "text", maxPieceLen = 2,
      vocabSize = 4, maxWordLen = 16)
    val out = Unigram.unigramEncode(d, "doc_id", "text", vocab,
      maxPieceLen = 2, maxWordLen = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "abab" = ab + ab (2 pieces) beats 4 singles on the packed metric
    assert(out(1L)._1 == 2L)
    // doc 2 is the same word twice: exactly double
    assert(out(2L)._1 == out(1L)._1 * 2)
    assert(out(2L)._2 == out(1L)._2 * 2)
  }

  test("unigramEncode: over-long and unsegmentable words take the " +
      "single unknown piece") {
    val d = docs((1L, "abcdefghij"))
    val vocab = Unigram.unigramSeed(d, "text", maxPieceLen = 2,
      vocabSize = 40, maxWordLen = 16)
    // maxWordLen below the word's length forces the unknown path
    val out = Unigram.unigramEncode(d, "doc_id", "text", vocab,
      maxPieceLen = 2, maxWordLen = 4).collect()
    assert(out.head.getLong(1) == 1L)
    // a vocabulary missing a character forces it too (encode corpus
    // differs from seed corpus)
    val out2 = Unigram.unigramEncode(docs((7L, "zzz")), "doc_id", "text",
      vocab, maxPieceLen = 2, maxWordLen = 16).collect()
    assert(out2.head.getLong(1) == 1L)
  }

  test("unigramEmStep: counts total the corpus piece count, vocabulary " +
      "only shrinks, singles survive") {
    val d = docs((1L, "abab cd abab"), (2L, "cd cd ababab"))
    val vocab = Unigram.unigramSeed(d, "text", maxPieceLen = 3,
      vocabSize = 6, maxWordLen = 16)
    val em = Unigram.unigramEmStep(d, "text", vocab, maxPieceLen = 3,
      maxWordLen = 16)
    val emRows = em.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val seedPieces = vocab.collect().map(_.getString(0)).toSet
    assert(emRows.keySet.subsetOf(seedPieces))
    assert(emRows.keySet.intersect(Set("a", "b", "c", "d")) ==
      Set("a", "b", "c", "d"))
    // Σ EM counts == Σ over corpus words of the Viterbi piece count
    val enc = Unigram.unigramEncode(d, "doc_id", "text", vocab,
      maxPieceLen = 3, maxWordLen = 16)
      .agg(sum(col("n_pieces"))).head().getLong(0)
    assert(emRows.values.map(_._1).sum == enc)
  }

  test("WordPiece.greedyPieces: longest-match-first, unknown paths for " +
      "over-long and unsegmentable words") {
    import graft.ext.WordPiece.greedyPieces
    val v = Set("ab", "cd", "abc", "a", "b", "c", "d")
    assert(greedyPieces("abcd", v, 4, 16) == (2L, 0L))   // abc + d
    assert(greedyPieces("abcd", v - "abc", 4, 16) == (2L, 0L)) // ab + cd
    assert(greedyPieces("dcba", v, 4, 16) == (4L, 0L))   // singles
    assert(greedyPieces("ax", v, 4, 16) == (1L, 1L))     // 'x' not in vocab
    assert(greedyPieces("a" * 17, v, 4, 16) == (1L, 1L)) // over maxWordLen
    // maxPieceLen caps the match even when a longer piece exists
    assert(greedyPieces("abc", v, 2, 16) == (2L, 0L))    // ab + c
  }

  test("wordPieceEncode: corpus-seeded vocab yields zero unknowns and " +
      "never beats the Viterbi optimum") {
    val d = docs((1L, "abab abab cd"), (2L, "abab cd cd"),
      (3L, "aVeryLongWordOver16Chars ab"))
    val vocab = Unigram.unigramSeed(d, "text")
    val greedy = graft.ext.WordPiece.wordPieceEncode(d, "doc_id", "text",
        vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val optimal = Unigram.unigramEncode(d, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // over-long word: the one unknown in the fixture
    assert(greedy(3L)._2 == 1L)
    assert(greedy(1L)._2 == 0L && greedy(2L)._2 == 0L)
    for ((id, (n, _)) <- greedy) assert(n >= optimal(id),
      s"doc $id: greedy $n < optimal ${optimal(id)}")
  }
}
