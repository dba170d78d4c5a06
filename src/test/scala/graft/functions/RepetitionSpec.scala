package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition kernel: hand-computed coverage fractions, the
  * positional (not multiplicative) coverage rule for overlapping
  * windows, the lexicographic tie-break, short-doc/empty edge cases,
  * and a property check against a naive in-test reimplementation.
  */
class RepetitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def stats(text: String, n: Int): (Long, Long) = {
    val r = Seq(text).toDF("text")
      .select(Repetition.ngramCoverStatsF(Text.tokens(col("text")), n)
        .as("s"))
      .collect()(0).getSeq[Long](0)
    (r(0), r(1))
  }

  test("hand-computed: modal 2-gram coverage") {
    // tokens: a b a b c — 2-grams: "a b"(x2), "b a", "b c"; top = "a b"
    // occurrences at 0 and 2 cover positions {0,1,2,3} = chars 4 of 5
    val (top, dup) = stats("a b a b c", 2)
    assert(top === 4L * 1000000L / 5L)
    assert(dup === 4L * 1000000L / 5L) // the same gram is the only dup
  }

  test("overlapping occurrences count positions once") {
    // tokens: x x x x — 2-gram "x x" x3, occurrences overlap; coverage
    // is ALL 4 positions, not 6 slots
    val (top, dup) = stats("x x x x", 2)
    assert(top === 1000000L)
    assert(dup === 1000000L)
  }

  test("tie-break: lexicographically smallest modal gram") {
    // "b c" and "a c" both occur once... make a real tie with count 2:
    // tokens: b z b z a y a y — "b z"x2, "z b"x1, "z a"x1, "a y"x2, "y a"x1
    // tie between "a y" and "b z" at count 2 → "a y" wins;
    // its occurrences (4,5) and (6,7) cover chars 4 of 8
    val (top, _) = stats("b z b z a y a y", 2)
    assert(top === 4L * 1000000L / 8L)
  }

  test("doc shorter than n and char-weighted coverage") {
    assert(stats("a b", 3) === ((0L, 0L)))
    // char weighting: tokens aa b aa — top 1-gram... n=2: "aa b", "b aa"
    // each once; top = "aa b" (lexicographic) covers chars 3 of 5
    val (top, dup) = stats("aa b aa", 2)
    assert(top === 3L * 1000000L / 5L)
    assert(dup === 0L)
  }

  test("code-point semantics: supplementary-plane chars count once") {
    // tokens: 😀(1cp) bb 😀 bb c — 2-grams: "😀 bb"x2, "bb 😀", "bb c";
    // top "😀 bb" covers positions {0,1,2,3} = 6 code points of 7 total.
    // UTF-16 String.length would count each 😀 as 2 (8 of 9) — the SQL
    // oracle (DuckDB length() = code points) pins the cp value.
    val (top, dup) = stats("😀 bb 😀 bb c", 2)
    assert(top === 6L * 1000000L / 7L)
    assert(dup === 6L * 1000000L / 7L)
  }

  test("code-point tie-break, not UTF-16 order") {
    // 1-grams: "😀😀"x2 (2cp) vs ""x2 (1cp) tie at count 2.
    // Code-point order (= DuckDB's UTF-8 byte order): U+E000 < U+1F600,
    // so "" wins, covering 2 of 7 code points. UTF-16 compareTo
    // orders the surrogate D83D below E000 and would pick "😀😀" (4/7).
    val (top, dup) = stats("😀😀  " +
      "😀😀  z", 1)
    assert(top === 2L * 1000000L / 7L)
    assert(dup === 6L * 1000000L / 7L) // both duplicated grams cover 6cp
  }

  test("property: matches a naive reimplementation") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "c", "dd", "e")
    val cases = (1 to 200).map { id =>
      (id.toLong,
        Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    def naive(toks: Vector[String], n: Int): (Long, Long) = {
      val m = toks.size
      if (m < n || toks.map(_.length).sum == 0) (0L, 0L)
      else {
        val grams = (0 to m - n).map(i => toks.slice(i, i + n).mkString(" "))
        val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
        val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head._1
        val tc = toks.map(_.length.toLong).sum
        def cover(sel: String => Boolean): Long = {
          val cov = Array.fill(m)(false)
          for (i <- 0 to m - n; if sel(grams(i)); j <- i until i + n)
            cov(j) = true
          toks.zipWithIndex.collect {
            case (t, i) if cov(i) => t.length.toLong
          }.sum
        }
        (cover(_ == top) * 1000000L / tc,
          cover(g => counts(g) >= 2) * 1000000L / tc)
      }
    }
    val df = cases.map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val got = df
        .select(col("id"),
          Repetition.ngramCoverStatsF(Text.tokens(col("text")), n).as("s"))
        .collect()
        .map(r => r.getLong(0) -> {
          val s = r.getSeq[Long](1); (s(0), s(1))
        }).toMap
      for ((id, toks) <- cases)
        assert(got(id) === naive(toks, n), s"toks=$toks n=$n")
    }
  }
}
