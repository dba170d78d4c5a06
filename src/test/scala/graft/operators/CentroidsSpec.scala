package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Group-centroid auditing: the exact truncating integer mean (incl.
  * negative coordinates), partition-invariance of the centroid, and
  * the outlier ranking (dist DESC, id ASC tie-break, NULL groups
  * excluded) checked against an independent brute-force reference
  * computed in plain Scala on the same quantized integers.
  */
class CentroidsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // (id, vec, group) — group "a" has a negative-sum dimension so the
  // truncating (toward zero, not floor) division is actually exercised.
  private val rows: Seq[(Long, Seq[Float], String)] = Seq(
    (1L, Seq(0.0f, -1.0f), "a"),
    (2L, Seq(1.0f, -2.0f), "a"),
    (3L, Seq(5.0f, -4.0f), "a"),
    (10L, Seq(0.0f, 0.0f), "b"),
    (11L, Seq(0.0f, 0.0f), "b"),
    (12L, Seq(2.0f, 2.0f), "b"),
    (99L, Seq(9.0f, 9.0f), null) // NULL group: excluded from the audit
  )

  private val S = 1000000L

  // Independent reference: quantize, integer-sum, truncate-divide.
  private def refCentroid(g: String): Array[Long] = {
    val vs = rows.filter(_._3 == g).map(_._2)
    Array.tabulate(2) { i =>
      val s = vs.map(v => Math.round(v(i).toDouble * S)).sum
      s / vs.size // Scala Long / truncates toward zero, same as SQL div
    }
  }

  private def refDists(g: String): Seq[(Long, Long)] = {
    val c = refCentroid(g)
    rows.filter(_._3 == g).map { case (id, v, _) =>
      val d = (0 until 2).map { i =>
        val q = Math.round(v(i).toDouble * S) - c(i); q * q
      }.sum
      (id, d)
    }
  }

  test("groupCentroids: exact truncating integer mean, negative dims, partition-invariant") {
    for (parts <- Seq(1, 3, 17)) {
      val df = rows.toDF("id", "vec", "grp").repartition(parts)
        .filter("grp IS NOT NULL")
      val got = Centroids.groupCentroids(df, "vec", "grp")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getSeq[Long](2).toArray.toSeq))).toMap
      assert(got("a") === ((3L, refCentroid("a").toSeq)), s"parts=$parts")
      assert(got("b") === ((3L, refCentroid("b").toSeq)), s"parts=$parts")
      assert(got.size == 2)
    }
    // the negative dimension really did truncate toward zero: sum=-7e6
    assert(refCentroid("a")(1) == -7000000L / 3L)
  }

  test("centroidOutliers: (dist DESC, id ASC) ranking vs brute force; NULL group absent") {
    val df = rows.toDF("id", "vec", "grp")
    val got = Centroids.centroidOutliers(df, "id", "vec", "grp", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = Seq("a", "b").flatMap { g =>
      refDists(g).sortBy { case (id, d) => (-d, id) }.take(2)
        .zipWithIndex.map { case ((id, d), i) => (g, (i + 1).toLong, id, d) }
    }
    assert(got === want)
    // group b's two zero-vectors tie on dist; the SMALLER id must win rank 2
    val b2 = got.find(t => t._1 == "b" && t._2 == 2L).get
    assert(b2._3 == 10L, "tie on dist must break to the smaller id")
    assert(!got.exists(_._3 == 99L), "NULL-group row must not appear")
  }

  test("centroidOutliers: group smaller than k returns its full membership") {
    val small = rows.filter(t => t._3 == "a").toDF("id", "vec", "grp")
    val got = Centroids.centroidOutliers(small, "id", "vec", "grp", k = 10)
    assert(got.count() == 3)
  }

  test("NULL vectors are excluded from n AND the sums (never just the numerator)") {
    val withNull = rows.filter(_._3 == "b") :+
      ((13L, null.asInstanceOf[Seq[Float]], "b"))
    val got = Centroids.groupCentroids(
        withNull.toDF("id", "vec", "grp"), "vec", "grp")
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2).toSeq)).head
    // the 3 real vectors decide both count and mean; the NULL row is gone
    assert(got === ((3L, refCentroid("b").toSeq)))
    // and a NULL row never surfaces as an outlier
    val outs = Centroids.centroidOutliers(
      withNull.toDF("id", "vec", "grp"), "id", "vec", "grp", k = 10)
    assert(outs.count() == 3 && !outs.collect().exists(_.getLong(2) == 13L))
  }

  test("non-long id columns are cast for the heap aggregate") {
    val intIds = rows.filter(_._3 == "a")
      .map { case (id, v, g) => (id.toInt, v, g) }
      .toDF("id", "vec", "grp")
    val got = Centroids.centroidOutliers(intIds, "id", "vec", "grp", k = 1)
      .collect()
    assert(got.length == 1 && got(0).getLong(2) == 3L)
  }

  test("centroidDrift: exact integer L2^2, one-sided groups NULL+flagged, NULL groups absent") {
    val v1 = rows.toDF("id", "vec", "grp")
    // vintage 2: group a loses doc 3 (centroid moves), group b is
    // dropped entirely, group c appears
    val v2 = (rows.filter(r => r._3 == "a" && r._1 != 3L) ++
      Seq((20L, Seq(1.0f, 1.0f), "c"), (99L, Seq(9.0f, 9.0f), null)))
      .toDF("id", "vec", "grp")
    val got = Centroids.centroidDrift(v1, v2, "vec", "grp",
        maxDist = 1000000000000L)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    assert(got.keySet === Set("a", "b", "c"), s"NULL group leaked: $got")
    // reference: a's v1 centroid (2.0, -2333333.33->trunc) vs v2 (two docs)
    val c1 = refCentroid("a")
    val v2a = rows.filter(r => r._3 == "a" && r._1 != 3L).map(_._2)
    val c2 = Array.tabulate(2) { i =>
      v2a.map(v => Math.round(v(i).toDouble * S)).sum / v2a.size
    }
    val expectDist = (0 until 2).map { i =>
      val d = c1(i) - c2(i); d * d
    }.sum
    assert(got("a") === ((Some(3L), Some(2L), Some(expectDist),
      expectDist > 1000000000000L)))
    assert(got("b") === ((Some(3L), None, None, true)),
      "disappearing group must be NULL-sided and flagged")
    assert(got("c") === ((None, Some(1L), None, true)),
      "appearing group must be NULL-sided and flagged")
  }
}
