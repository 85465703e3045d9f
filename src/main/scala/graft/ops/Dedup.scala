package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.functions._

/** Large-scale dedup suite — the training-data-pipeline extensions
  * (SURVEY.md §0 L3; dedup need anchored at the reference's overlapping
  * 24 h windows, src/main.py:263).
  *
  * Scale design (100 TB): every variant is sketch → band/block → bucket
  * equi-join → exact verify on the (tiny) candidate set. The bucket join
  * shuffles on the band key, so work is proportional to candidate pairs,
  * not corpus²; sketches are per-row map-side computations; no driver
  * state. All randomness comes from the portable md5-based hash (U.h64),
  * so every stage — including the probabilistic LSH recall — is
  * bit-identical to the DuckDB oracle.
  */
object Dedup {

  val NumSeeds = 16  // MinHash signature length
  val NumBands = 8   // 8 bands × 2 rows: catches jac≥0.2 pairs w.h.p.
  val NumPlanes = 16 // hyperplane LSH: 4 tables × 4 bits
  val NumTables = 4

  /** Deterministic hyperplane components in [-1000, 1000], baked from the
    * shared hash into both the Spark plan and the oracle SQL. */
  lazy val planes: Array[Array[Long]] =
    Array.tabulate(NumPlanes, 64)((p, i) => U.h64Local(s"$p:$i") % 2001L - 1000L)

  private def withShingles(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("shs", expr(
        """array_distinct(transform(sequence(3, size(toks)),
             i -> concat(element_at(toks, i-2), ' ', element_at(toks, i-1), ' ', element_at(toks, i))))"""))
      .select(col("doc_id"), col("shs"))

  val qs: Map[String, Q] = Map(
    // MinHash + LSH banding: per-doc 16-slot signature (min of seeded
    // hash over shingles), 8 bands of 2 rows, bucket join on band value,
    // exact-Jaccard verify of candidates. Output == the exact
    // q_sim_jaccard pairs that LSH recalls — deterministic because the
    // hash (and therefore the banding) is shared with the oracle.
    "q_dedup_minhash" -> ((s, d) => {
      import s.implicits._
      val sh = withShingles(Tables.documents(s, d)).cache()
      val mins = sh.select($"doc_id", explode($"shs").as("sh"))
        .groupBy($"doc_id")
        .agg(
          min(U.h64(concat(lit("0:"), $"sh"))).as("m0"),
          (1 until NumSeeds).map(j =>
            min(U.h64(concat(lit(s"$j:"), $"sh"))).as(s"m$j")): _*)
      val bandCols = array((0 until NumBands).map(b =>
        concat_ws(":", lit(b), col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)
      val bands = mins.select($"doc_id", explode(bandCols).as("band"))
      val cand = bands.as("a")
        .join(bands.as("b"), $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(sh.select($"doc_id".as("d1"), $"shs".as("sa")), "d1")
        .join(sh.select($"doc_id".as("d2"), $"shs".as("sb")), "d2")
        .withColumn("ni", size(array_intersect($"sa", $"sb")).cast("long"))
        .withColumn("jac", round($"ni".cast("double") / (size($"sa") + size($"sb") - $"ni"), 6))
        .filter($"jac" >= 0.2)
        .select($"d1", $"d2", $"jac")
        .orderBy("d1", "d2")
    }),
    // SimHash: 32-bit signature from token-frequency-weighted hash bits;
    // 4-byte blocking gives EXACT recall for hamming distance ≤ 3
    // (pigeonhole: ≤3 differing bits leave ≥1 of 4 bytes identical).
    "q_dedup_simhash" -> ((s, d) => {
      import s.implicits._
      val tf = Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("t"))
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("f"))
        .withColumn("h", U.h64($"t"))
      val bitSums = (0 until 32).map(k =>
        sum(when(shiftright($"h", k).bitwiseAND(1) === 1, $"f").otherwise(-$"f")).as(s"b$k"))
      val sums = tf.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      val code = (0 until 32).map(k =>
        when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
      val codes = sums.select($"doc_id", code.as("simhash"))
      val blkCols = array((0 until 4).map(b =>
        concat_ws(":", lit(b), shiftright($"simhash", b * 8).bitwiseAND(255))): _*)
      val blocks = codes.select($"doc_id", $"simhash", explode(blkCols).as("blk"))
      blocks.as("a")
        .join(blocks.as("b"), $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"a.simhash".as("h1"),
                $"b.doc_id".as("d2"), $"b.simhash".as("h2"))
        .distinct()
        .withColumn("ham", expr("bit_count(h1 ^ h2)").cast("long"))
        .filter($"ham" <= 3)
        .select($"d1", $"d2", $"ham")
        .orderBy("d1", "d2")
    }),
    // Character-5-gram Jaccard, incremental shape: new-batch docs
    // (doc_id % 25 = 0) against the whole corpus — the bounded-candidate
    // form that survives corpus² growth.
    "q_dedup_ngram" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.documents(s, d)
        .withColumn("gs", expr(
          "array_distinct(transform(sequence(1, length(text)-4), i -> substring(text, i, 5)))"))
        .select($"doc_id", $"gs")
        .cache()
      val q = grams.filter($"doc_id" % 25 === 0)
      val e = grams.select($"doc_id", explode($"gs").as("g"))
      val eq = q.select($"doc_id", explode($"gs").as("g"))
      val inter = eq.as("a")
        .join(e.as("b"), $"a.g" === $"b.g" && $"a.doc_id" =!= $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(count(lit(1)).as("ni"))
      val sizes = grams.select($"doc_id", size($"gs").as("n"))
      inter
        .join(sizes.select($"doc_id".as("d1"), $"n".as("n1")), "d1")
        .join(sizes.select($"doc_id".as("d2"), $"n".as("n2")), "d2")
        .withColumn("jac", round($"ni".cast("double") / ($"n1" + $"n2" - $"ni"), 6))
        .filter($"jac" >= 0.3)
        .select($"d1", $"d2", $"jac")
        .orderBy("d1", "d2")
    }),
    // Embedding near-dup: 4-table × 4-bit random-hyperplane LSH blocking,
    // exact int64-scaled cosine ≥ 0.4 verify on bucket collisions.
    "q_dedup_embed" -> ((s, d) => {
      import s.implicits._
      val planeLits = (0 until NumPlanes).map(p =>
        array(planes(p).map(lit): _*))
      val scaled = Tables.embeddings(s, d)
        .withColumn("v", expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
        .withColumn("norm2", expr("aggregate(v, 0L, (acc, x) -> acc + x * x)"))
      val withBits = (0 until NumPlanes).foldLeft(scaled) { (df, p) =>
        df.withColumn(s"bit$p",
          when(aggregate(zip_with($"v", planeLits(p), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x) > 0, 1L).otherwise(0L))
      }
      val tableCols = array((0 until NumTables).map { t =>
        val code = (0 until 4).map(k => col(s"bit${4 * t + k}") * lit(1L << k)).reduce(_ + _)
        concat_ws(":", lit(t), code)
      }: _*)
      val buckets = withBits.select($"vec_id", explode(tableCols).as("bkt"))
      val cand = buckets.as("a")
        .join(buckets.as("b"), $"a.bkt" === $"b.bkt" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
        .distinct()
      cand
        .join(scaled.select($"vec_id".as("d1"), $"v".as("va"), $"norm2".as("na")), "d1")
        .join(scaled.select($"vec_id".as("d2"), $"v".as("vb"), $"norm2".as("nb")), "d2")
        .withColumn("dot", expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
        .withColumn("sim", round($"dot".cast("double") /
          (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))), 6))
        .filter($"sim" >= 0.4)
        .select($"d1", $"d2", $"sim")
        .orderBy("d1", "d2")
    })
  )
}
