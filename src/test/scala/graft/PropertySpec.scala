package graft

import graft.functions.GraftFunctions
import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties (SURVEY.md §5 layer 3) over scalacheck-generated
  * frames. No scalatestplus bridge is resolvable offline, so generators
  * are sampled explicitly with fixed seeds (deterministic runs). */
class PropertySpec extends AnyFunSuite with TestSpark {

  private val rowsGen = Gen.listOfN(30,
    Gen.zip(Gen.choose(0L, 9L), Gen.choose(-100.0, 100.0)))

  private def samples(n: Int): Seq[List[(Long, Double)]] =
    (0 until n).map(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil))

  test("sketch aggregates equal their expression forms on random strings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val strGen = Gen.listOfN(200, Gen.zip(
      Gen.choose(0L, 19L),
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
        .flatMap(s => Gen.oneOf(s, s + " é∂", "", "  ", s.reverse))))
    for (i <- 0 until 3) {
      val rows = strGen.apply(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      val df = rows.toDF("id", "s")
      // minhash_agg vs N min(xxhash64(i, s)) columns
      val aggs = (0 until 8).map(j => min(xxhash64(lit(j), col("s"))).as(s"m$j"))
      val viaExprs = df.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      val viaAgg = df.groupBy(col("id"))
        .agg(call_function("minhash_agg", col("s"), lit(8)).as("sig"))
        .select(col("id") +: (0 until 8).map(j => col("sig").getItem(j).as(s"m$j")): _*)
      assert(viaExprs.exceptAll(viaAgg).count() === 0)
      assert(viaAgg.exceptAll(viaExprs).count() === 0)
      // simhash_agg vs the 64-column bit-sum form
      val h = df.withColumn("h", xxhash64(col("s")))
      val bitSums = (0 until 64).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
          .as(s"s$j") }
      val summed = h.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      val lo = (0 until 32)
        .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      val hi = (32 until 64)
        .map(j => when(col(s"s$j") > 0, lit(1L << (j - 32))).otherwise(lit(0L))).reduce(_ + _)
      val shExprs = summed.select(col("id"), lo.as("lo"), hi.as("hi"))
      val shAgg = h.groupBy(col("id"))
        .agg(call_function("simhash_agg", col("h")).as("sh"))
        .select(col("id"), col("sh.lo").as("lo"), col("sh.hi").as("hi"))
      assert(shExprs.exceptAll(shAgg).count() === 0)
      assert(shAgg.exceptAll(shExprs).count() === 0)
    }
  }

  test("SeqPattern: the compiled table equals a direct rule interpreter on random patterns and inputs") {
    // The one-table parity design (Spark fold, oracle CTE, and
    // streaming step all render from Compiled.rows) means a bug in
    // table CONSTRUCTION is invisible to the oracle gate — both
    // engines would execute the same wrong table. The guard is an
    // INDEPENDENT interpreter of the documented scan rules (absorb /
    // advance-through-optionals / restart-at-row), structured as a
    // direct per-event walk over the Elems with no precomputed table.
    import graft.operators.SeqPattern
    import graft.operators.SeqPattern.Elem
    def interpret(elems: Seq[Elem], input: Seq[Char]): (Long, Int) = {
      val n = elems.length
      // rule 2: first j > s with class match, optionals skippable
      def adv(s: Int, c: Char): Option[Int] = {
        var j = s + 1
        while (j <= n) {
          if (elems(j - 1).cls == c) return Some(j)
          if (elems(j - 1).quant != '?') return None
          j += 1
        }
        None
      }
      var st = 0; var done = 0L
      input.foreach { c =>
        val absorb = st >= 1 && elems(st - 1).quant == '+' &&
          elems(st - 1).cls == c
        if (absorb) () // rule 1
        else adv(st, c) match {
          case Some(j) if j == n => done += 1; st = 0 // rule 2, emit
          case Some(j) => st = j // rule 2
          case None => adv(0, c) match { // rule 3
            case Some(j) if j == n => done += 1; st = 0
            case Some(j) => st = j
            case None => st = 0
          }
        }
      }
      (done, st)
    }
    def fold(pat: SeqPattern.Compiled, input: Seq[Char]): (Long, Int) = {
      var st = 0; var done = 0L
      input.foreach { c =>
        val (next, emits) = pat.step(st, c)
        if (emits) done += 1
        st = next
      }
      (done, st)
    }
    // random LEGAL patterns over {A, B, C}: draw until compile accepts
    val rnd = new scala.util.Random(99)
    def randomPattern(): SeqPattern.Compiled = {
      while (true) {
        val n = 1 + rnd.nextInt(4)
        val p = (0 until n).map { _ =>
          val cls = ('A' + rnd.nextInt(3)).toChar
          val q = rnd.nextInt(3) match {
            case 0 => ""; case 1 => "+"; case 2 => "?"
          }
          s"$cls$q"
        }.mkString(" ")
        try return SeqPattern.compile(p)
        catch { case _: IllegalArgumentException => () }
      }
      throw new IllegalStateException("unreachable")
    }
    (1 to 60).foreach { _ =>
      val pat = randomPattern()
      val input = Seq.fill(1 + rnd.nextInt(30))(
        ('A' + rnd.nextInt(4)).toChar) // includes 'D', a foreign class
      val viaTable = fold(pat, input)
      val viaRules = interpret(pat.elems, input)
      assert(viaTable === viaRules,
        s"pattern '${pat.elems.map(e => s"${e.cls}${e.quant}")
          .mkString(" ")}' diverges on ${input.mkString}: " +
          s"table=$viaTable rules=$viaRules")
    }
  }

  test("filter commutes with projection") {
    for (rows <- samples(5)) {
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val a = df.filter(col("k") > 4).select(col("k"), (col("v") * 2).as("w"))
      val b = df.select(col("k"), (col("v") * 2).as("w")).filter(col("k") > 4)
      assert(a.collect().sortBy(_.getLong(0)).toSeq ===
        b.collect().sortBy(_.getLong(0)).toSeq)
    }
  }

  test("unionAll cardinality is additive; distinct union is a fixpoint") {
    for (Seq(r1, r2) <- samples(6).grouped(2)) {
      import spark.implicits._
      val (a, b) = (r1.toDF("k", "v"), r2.toDF("k", "v"))
      assert(a.unionAll(b).count() === a.count() + b.count())
      val u = a.union(b).distinct()
      assert(u.union(u).distinct().count() === u.count())
    }
  }

  test("merge upsert: key set = union of key sets, updates win") {
    for (Seq(r1, r2) <- samples(6).grouped(2)) {
      import spark.implicits._
      val t = r1.toDF("k", "v").dropDuplicates("k")
      val u = r2.toDF("k", "v").dropDuplicates("k")
      val m = Merge.upsert(t, u, Seq("k"))
      val keys = m.select("k").collect().map(_.getLong(0)).toSet
      val expected = (t.select("k").collect().map(_.getLong(0)) ++
        u.select("k").collect().map(_.getLong(0))).toSet
      assert(keys === expected)
      val uVals = u.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      m.collect().foreach { r =>
        uVals.get(r.getLong(0)).foreach(uv => assert(r.getDouble(1) === uv))
      }
    }
  }

  test("multi-clause merge: priority, all clause kinds fire, and re-merge is a fixpoint") {
    import spark.implicits._
    val target = (0L until 20L).map(i => (i, i * 10.0)).toDF("k", "v")
    val source = (10L until 30L).map(i => (i, i * 100.0)).toDF("k", "v")
    // DELETE band 12-15 (first-match-wins over the unconditional UPDATE),
    // UPDATE the rest of the matches, INSERT everything outside the band;
    // insert values mirror update values so a second merge of the SAME
    // source is a fixpoint (deleted keys stay deleted — the insert
    // condition excludes them).
    val band = (c: org.apache.spark.sql.Column) => c.between(12L, 15L)
    val clauses = Seq(
      Merge.MatchedDelete(Some(band(Merge.src("k")))),
      Merge.MatchedUpdate(None, Map("v" -> (Merge.src("v") + 1.0))),
      Merge.NotMatchedInsert(Some(!band(Merge.src("k"))),
        Map("v" -> (Merge.src("v") + 1.0))))
    val once = Merge.merge(target, source, Seq("k"), clauses)
    val got = once.as[(Long, Double)].collect().toMap
    val expect =
      (0L until 10L).map(i => i -> i * 10.0).toMap ++       // untouched
      Seq(10L, 11L, 16L, 17L, 18L, 19L).map(i => i -> (i * 100.0 + 1)) ++ // updated
      (20L until 30L).map(i => i -> (i * 100.0 + 1))         // inserted
    assert(got === expect) // 12-15 deleted
    // fixpoint: merging the same source into the result changes nothing
    val twice = Merge.merge(once, source, Seq("k"), clauses)
    assert(once.exceptAll(twice).count() === 0)
    assert(twice.exceptAll(once).count() === 0)
  }

  test("cosine similarity bounded in [-1, 1] on fixture embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .withColumn("norm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"), col("norm").as("nb"))
    val out = a.join(b, col("ida") < col("idb")).limit(5000)
      .select((call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
      .agg(min("sim"), max("sim")).head()
    assert(out.getDouble(0) >= -1.0000001 && out.getDouble(1) <= 1.0000001)
  }

  test("dropDuplicates is a fixpoint and minimal") {
    for (rows <- samples(5)) {
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val d1 = df.dropDuplicates("k")
      assert(d1.dropDuplicates("k").count() === d1.count())
      assert(d1.count() === df.select("k").distinct().count())
    }
  }

  test("SCD2 validity intervals never overlap per key (fixture events)") {
    val scd = SparkEntry.queries("s9_scd2_snapshot")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    val bad = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
      .count()
    assert(bad === 0, "intervals must tile without gaps or overlaps")
  }

  test("CDC chunking: a one-token edit perturbs only nearby chunks (edit locality)") {
    // THE content-defined-chunking claim, as a property: delete ONE
    // random token from a random document and the chunk sets re-align —
    // only the chunks overlapping the edit's hash window can differ,
    // so the shared-chunk count stays within a constant of the total
    // (fixed-width chunking shifts EVERY boundary after the edit and
    // shares ~nothing). All 60 cases ride one Spark job.
    import spark.implicits._
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(42)
    val words = Vector("the", "fast", "key", "order", "sort", "table",
      "scan", "merge", "join", "hash", "page", "row", "col", "disk")
    val cases = (0 until 60).map { i =>
      val n = 50 + rnd.nextInt(150)
      val toks = Vector.fill(n)(words(rnd.nextInt(words.size)))
      val cut = 5 + rnd.nextInt(n - 10)
      val mutated = toks.take(cut) ++ toks.drop(cut + 1)
      (i.toLong, toks.mkString(" "), mutated.mkString(" "))
    }
    val df = cases.toDF("id", "orig", "mut")
    val origChunks = TextFunctions.cdcChunkRows(
      df.select(col("id"), col("orig").as("text")), "id", "text")
      .groupBy("id").agg(collect_list(col("chunk")).as("chunks"))
      .as[(Long, Seq[String])].collect().toMap
    val mutChunks = TextFunctions.cdcChunkRows(
      df.select(col("id"), col("mut").as("text")), "id", "text")
      .groupBy("id").agg(collect_list(col("chunk")).as("chunks"))
      .as[(Long, Seq[String])].collect().toMap
    cases.foreach { case (id, _, _) =>
      val o = origChunks(id); val m = mutChunks(id)
      // multiset intersection size
      val om = o.groupBy(identity).view.mapValues(_.size)
      val mm = m.groupBy(identity).view.mapValues(_.size)
      val shared = om.map { case (c, k) => math.min(k, mm.getOrElse(c, 0)) }.sum
      val differing = (o.size - shared) + (m.size - shared)
      assert(differing <= 6,
        s"case $id: a 1-token edit changed $differing chunks " +
          s"(orig ${o.size}, mut ${m.size}) — boundaries did not re-align")
    }
  }

  test("soundex_code: format invariants on random strings") {
    // whatever the input, the output is NULL or exactly letter+3 digits,
    // case-insensitive, and stable under repeated suffix noise
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789'- ".toCharArray
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(12)
      val in = new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
      val out = graft.functions.Soundex.code(UTF8String.fromString(in))
      if (out != null) {
        val sx = out.toString
        assert(sx.matches("[A-Z][0-9]{3}"), s"soundex('$in') = '$sx'")
        // case-insensitivity
        val lower = graft.functions.Soundex.code(
          UTF8String.fromString(in.toLowerCase))
        assert(lower != null && lower.toString == sx,
          s"case instability on '$in'")
      } else {
        assert(in.isEmpty || !in.head.isLetter || in.head > 'z',
          s"null for letter-headed input '$in'")
      }
    }
  }

  test("MV rewrite: random aggregate shapes over the MV equal the direct computation") {
    import spark.implicits._
    import graft.plans.MvRewrite
    import graft.sources.DeltaLite
    val dir = java.nio.file.Files.createTempDirectory("graft_mvprop").toString
    val src = s"$dir/fact"; val mvp = s"$dir/mv"
    val rnd = new scala.util.Random(7)
    // integer measures → every derivation is exact, no float tolerance
    val rows = (1 to 4000).map { i =>
      (s"k${rnd.nextInt(7)}", s"g${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)
    }
    DeltaLite.create(spark, src, rows.toDF("a", "b", "v").repartition(4))
    DeltaLite.create(spark, mvp, DeltaLite.read(spark, src)
      .groupBy(col("a"), col("b"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"),
        min(col("v")).as("mn"), max(col("v")).as("mx")))
    try {
      MvRewrite.register(spark, MvRewrite.MvDef(
        sourcePath = src, mvPath = mvp,
        keyMap = Map("a" -> "a", "b" -> "b"),
        sumMap = Map("v" -> "s"), cntCol = "c",
        minMap = Map("v" -> "mn"), maxMap = Map("v" -> "mx")))
      val groupChoices = Seq(Seq("a"), Seq("b"), Seq("a", "b"))
      (0 until 8).foreach { i =>
        val keys = groupChoices(i % groupChoices.size)
        val fns = Seq(
          sum(col("v")).as("m1"), count(lit(1)).as("m2"),
          min(col("v")).as("m3"), max(col("v")).as("m4"))
        val picked = rnd.shuffle(fns).take(1 + rnd.nextInt(3))
        def q() = DeltaLite.read(spark, src)
          .groupBy(keys.map(col): _*).agg(picked.head, picked.tail: _*)
          .orderBy(keys.map(col): _*)
        val rewritten = q().collect()
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val direct = q().collect()
        spark.conf.set("spark.graft.mv.autoRewrite", "true")
        assert(rewritten.map(_.toString).toSeq ===
          direct.map(_.toString).toSeq,
          s"case $i (keys=$keys, aggs=${picked.size}) diverged")
      }
    } finally {
      MvRewrite.deregister(src)
      spark.conf.set("spark.graft.mv.autoRewrite", "true")
    }
  }

  test("DistributedRank: random data × random monotone bin widths equal the driver total order") {
    import spark.implicits._
    import graft.operators.DistributedRank
    val gen = Gen.listOfN(400, Gen.zip(Gen.choose(1L, 100000L),
      Gen.choose(-5000L, 5000L)))
    (0 until 4).foreach { i =>
      val raw = gen.apply(Gen.Parameters.default, Seed(91L + i)).getOrElse(Nil)
      // distinct ids so the (v, id) order is total
      val rows = raw.zipWithIndex.map { case ((_, v), idx) => (idx.toLong, v) }
      val width = Seq(7L, 100L, 999L, 4096L)(i) // random-ish bin widths
      val df = rows.toDF("id", "v").repartition(5)
      // floor-div keeps bins monotone over NEGATIVE values too
      val got = DistributedRank.withGlobalRank(df,
          expr(s"CAST(floor(v / $width.0D) AS BIGINT)"),
          Seq(col("v").asc, col("id").asc), "r", totalOut = Some("n"))
        .select(col("id"), col("r"), col("n")).collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
      val want = rows.sortBy { case (id, v) => (v, id) }
        .zipWithIndex.map { case ((id, _), j) => id -> (j + 1).toLong }.toMap
      assert(got.size === rows.size)
      got.foreach { case (id, (r, n)) =>
        assert(n === rows.size.toLong)
        assert(r === want(id), s"width=$width id=$id")
      }
    }
  }
}
