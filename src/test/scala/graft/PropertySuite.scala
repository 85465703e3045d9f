package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws (SURVEY.md §5.3) checked with ScalaCheck generators
  * over small in-memory DataFrames. The scalatest-scalacheck bridge
  * isn't on the offline classpath, so samples are drawn directly with
  * fixed seeds (deterministic runs). */
class PropertySuite extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val wordGen = Gen.oneOf("scan", "join", "sort", "hash", "merge", "agg")
  private val docGen = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))

  test("union counts add; intersect/except partition rows") {
    import spark.implicits._
    forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))) {
      (a: List[Long], b: List[Long]) =>
        val da = a.toDF("x"); val db = b.toDF("x")
        assert(da.union(db).count() == a.size + b.size)
        val inter = da.distinct().intersect(db.distinct()).count()
        val exc = da.distinct().except(db.distinct()).count()
        assert(inter + exc == da.distinct().count())
    }
  }

  test("Jaccard (shingle-set) is within [0,1], symmetric, and 1 on self") {
    def shingles(s: String): Set[String] =
      s.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else a.intersect(b).size.toDouble / a.union(b).size
    forAll(docGen, docGen) { (d1: String, d2: String) =>
      val (s1, s2) = (shingles(d1), shingles(d2))
      whenever(s1.nonEmpty && s2.nonEmpty) {
        val j = jac(s1, s2)
        assert(j >= 0.0 && j <= 1.0)
        assert(jac(s2, s1) == j)
        assert(jac(s1, s1) == 1.0)
      }
    }
  }

  test("exact dedup is idempotent") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(docGen)) { (docs: List[String]) =>
      val df = docs.toDF("text")
      val once = df.dropDuplicates("text")
      assert(once.dropDuplicates("text").count() == once.count())
      assert(once.count() == docs.distinct.size)
    }
  }

  test("limit(n).count <= n and <= total") {
    import spark.implicits._
    forAll(Gen.listOf(Gen.chooseNum(0, 100)), Gen.chooseNum(0, 20)) {
      (xs: List[Int], n: Int) =>
        val c = xs.toDF("x").limit(n).count()
        assert(c <= n && c <= xs.size)
    }
  }

  test("tumbling windows partition the time axis: per-window counts sum to total") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 10_000_000L))) { (secs: List[Long]) =>
      val df = secs.toDF("s").withColumn("ts", timestamp_seconds($"s"))
      val windowed = df.groupBy(window($"ts", "1 hour")).count()
      assert(windowed.agg(sum("count")).first().getLong(0) == secs.size)
      // each event falls in exactly one window: no window overlaps another
      val bounds = windowed.select($"window.start".cast("long"), $"window.end".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      bounds.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2)
        case _ =>
      }
    }
  }

  test("U.h64 is stable and non-negative (matches driver-side twin)") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(docGen)) { (ss: List[String]) =>
      val got = ss.distinct.toDF("s").select($"s", U.h64($"s")).as[(String, Long)]
        .collect().toMap
      ss.distinct.foreach { s =>
        assert(got(s) == U.h64Local(s))
        assert(got(s) >= 0L)
      }
    }
  }

  test("connectedComponents == reference union-find on random graphs") {
    import spark.implicits._
    // a scala-side union-find is the independent oracle
    def ufComponents(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v)); if (ru != rv) parent(ru max rv) = ru min rv
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min member per root = the canonical label contract
      val byRoot = verts.groupBy(find)
      byRoot.flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
    }
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)).suchThat(e => e._1 != e._2))
    forAll(edgeGen, n = 12) { edges: List[(Long, Long)] =>
      val got = ops.Dedup.connectedComponents(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufComponents(edges), s"edges: $edges")
      // the star variant must agree label-for-label with both
      val (starDf, _) = ops.Dedup.connectedComponentsStar(edges.toDF("u", "v"))
      val star = starDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == got, s"star CC disagrees with hash-to-min on: $edges")
    }
  }

  test("int8 quantization round-trip error bound holds on random int64 vectors") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-10000000L, 10000000L))
    forAll(vecGen, n = 50) { v: List[Long] =>
      val mn = v.min; val mx = v.max; val rng = math.max(mx - mn, 1L)
      v.foreach { x =>
        val q = (x - mn) * 255 / rng
        val dq = mn + q * rng / 255
        assert(q >= 0 && q <= 255, s"code $q out of int8 range")
        assert(math.abs(x - dq) <= rng / 255 + 1,
          s"err ${math.abs(x - dq)} > step bound for x=$x in [$mn,$mx]")
      }
    }
  }

  test("PII redaction is idempotent and leaves clean text untouched") {
    // the regex chain the query uses; masks must never re-match
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\b\\d{3}-\\d{4}\\b"
    def redact(s: String): String = s
      .replaceAll(email, "<EMAIL>").replaceAll(ip, "<IP>").replaceAll(phone, "<PHONE>")
    val piiGen = Gen.oneOf(
      "call 555-0134 now", "bob.a@ex-1.com wrote", "from 10.1.2.3 at dawn",
      "x@y.io or 10.0.0.1 or 555-9999", "plain words only here")
    forAll(Gen.zip(docGen, piiGen), n = 50) { case (doc, pii) =>
      val s = s"$doc $pii $doc"
      val once = redact(s)
      assert(redact(once) == once, s"redaction not idempotent on: $s")
      assert(!once.contains("@") || once.contains("<EMAIL>"))
      assert(redact(doc) == doc, s"clean word-soup doc was altered: $doc")
    }
  }

  test("salted two-pass windows == naive windows on random low-cardinality graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random rows over 2 keys with clustered secs and heavy value ties —
    // the adversarial shapes for chunk boundaries (rows exactly AT a
    // multiple of the window width) and rank ties
    val rowGen = Gen.zip(
      Gen.oneOf("a", "b"),
      Gen.chooseNum(0L, 300L).map(_ * 20L), // secs land on chunk edges often
      Gen.chooseNum(0L, 5L))
    forAll(Gen.nonEmptyListOf(rowGen), n = 10) { rows: List[(String, Long, Long)] =>
      val df = rows.zipWithIndex
        .map { case ((k, sec, v), i) => (i.toLong, k, sec, v) }
        .toDF("id", "event_type", "sec", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"sec").rangeBetween(-999, 0)
      val naiveR = df.select($"id", sum($"value").over(w).as("c"), count(lit(1)).over(w).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val saltedR = ops.Windows.saltedTrailingRange(df, "event_type", "sec", $"value", 1000L)
        .select($"id", $"trailing_c", $"trailing_n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(saltedR == naiveR, s"salted RANGE diverged on: $rows")
      val tie = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"value".desc)
      val naiveK = df.select($"id", rank().over(tie).cast("long").as("r"),
        dense_rank().over(tie).cast("long").as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val saltedK = ops.Windows.saltedRank(df, "event_type", "value")
        .select($"id", $"rnk", $"drnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(saltedK == naiveK, s"salted rank diverged on: $rows")
    }
  }

  test("z16 Morton interleave preserves prefix locality (shared z-prefix bounds both keys)") {
    import spark.implicits._
    val pairs = Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))
    val rows = (0 until 200).flatMap(i =>
      pairs.apply(Gen.Parameters.default, Seed(i.toLong))).toList
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ops.Layout.z16($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      // de-interleave must recover the inputs exactly (bijectivity)
      var xi = 0L; var yi = 0L
      (0 until 16).foreach { k =>
        xi |= ((z >> (2 * k)) & 1L) << k
        yi |= ((z >> (2 * k + 1)) & 1L) << k
      }
      assert(xi == x && yi == y, s"z16 not bijective at ($x,$y) -> $z")
      // sharing the top-8 z-prefix pins the top-4 bits of EACH key:
      // any two such points differ by < 4096 in both coordinates
      val bucket = z >> 24
      got.filter { case (_, _, z2) => (z2 >> 24) == bucket }.foreach {
        case (x2, y2, _) =>
          assert(math.abs(x2 - x) < 4096 && math.abs(y2 - y) < 4096,
            s"bucket $bucket spans ($x,$y)..($x2,$y2)")
      }
    }
  }

  test("Misra-Gries: frequent-item guarantee survives arbitrary merge trees") {
    // The mergeable-summaries law D16 leans on (Agarwal et al., PODS'12):
    // for ANY stream split into ANY partitions reduced independently and
    // merged in ANY tree order, every item with true frequency > N/(K+1)
    // appears in the final summary. Checked on skewed random streams
    // (zipf-ish: small alphabet + planted hot keys) with random splits
    // and a random binary merge order — the adversarial setting the one
    // in-Spark test (fixed 8-partition layout) cannot cover.
    val mg = ops.Aggregates.MisraGriesAgg
    val streamGen = for {
      hot <- Gen.chooseNum(1, 3)
      n <- Gen.chooseNum(200, 1200)
      items <- Gen.listOfN(n, Gen.frequency(
        4 -> Gen.chooseNum(0, hot - 1).map(i => s"hot$i"),
        6 -> Gen.chooseNum(0, 499).map(i => s"cold$i")))
      cuts <- Gen.listOfN(7, Gen.chooseNum(0, n))
      shuffleSeed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (items, cuts.sorted, shuffleSeed)
    forAll(streamGen, n = 40) { case (items, cuts, shuffleSeed) =>
      val n = items.size
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // split at the random cut points → independent partial reductions
      val bounds = (0 +: cuts :+ n).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        items.slice(a, b).foldLeft(mg.zero)(mg.reduce)
      }
      // merge in a random order (fold over a shuffled partition list is
      // an arbitrary left-deep merge tree)
      val order = new scala.util.Random(shuffleSeed).shuffle(parts)
      val summary = order.foldLeft(mg.zero)(mg.merge)
      assert(summary.size <= 64, s"summary overflowed: ${summary.size}")
      val mustHave = exact.collect { case (k, c) if c * 65 > n => k }.toSet
      val got = summary.keySet
      assert(mustHave.subsetOf(got),
        s"guarantee violated: missing ${mustHave -- got} (n=$n, parts=${parts.size})")
      // and the estimate error bound: est ∈ [true − N/(K+1), true]
      summary.foreach { case (k, est) =>
        val t = exact.getOrElse(k, 0L)
        assert(est <= t && est >= t - n / 65 - 1, s"$k est=$est true=$t n=$n")
      }
    }
  }
}
