package graft

import java.nio.file.Files
import graft.queries.Medallion.Pipeline
import graft.sources.DeltaLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DeltaLite storage semantics + medallion pipeline + dbt-style schema
  * tests (SURVEY.md §3 EP2, §5: unique / not_null / relationships compile
  * to violation-count queries). */
class MedallionSpec extends AnyFunSuite with TestSpark {

  test("DeltaLite: create/append/merge version lineage + time travel") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_delta").toString
    val v0 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v")
    assert(DeltaLite.create(spark, path, v0) === 0L)
    assert(DeltaLite.append(spark, path, Seq((3L, "c", 3.0)).toDF("k", "s", "v")) === 1L)
    assert(DeltaLite.merge(spark, path,
      Seq((2L, "B", 9.0), (4L, "d", 4.0)).toDF("k", "s", "v"), Seq("k")) === 2L)

    assert(DeltaLite.read(spark, path, Some(0L)).count() === 2)
    assert(DeltaLite.read(spark, path, Some(1L)).count() === 3)
    val latest = DeltaLite.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(latest === Seq((1L, "a", 1.0), (2L, "B", 9.0), (3L, "c", 3.0),
      (4L, "d", 4.0)))
    assert(DeltaLite.latestVersion(path) === Some(2L))
  }

  test("DeltaLite: CHECK constraints gate every write path and survive the log") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_constraints").toString
    DeltaLite.create(spark, path, Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    DeltaLite.addConstraint(spark, path, "v_positive", "v > 0")
    DeltaLite.addConstraint(spark, path, "k_not_null", "k IS NOT NULL")

    // adding a constraint existing data violates is refused
    intercept[IllegalArgumentException](
      DeltaLite.addConstraint(spark, path, "impossible", "v > 15"))

    // good append passes; NULL v passes (SQL CHECK: unknown is not false)
    DeltaLite.append(spark, path, Seq((3L, "c", 3.0)).toDF("k", "s", "v"))
    DeltaLite.append(spark, path,
      Seq((4L, "d", Option.empty[Double])).toDF("k", "s", "v"))

    // violating APPEND / MERGE / UPDATE are refused and commit nothing
    val before = DeltaLite.latestVersion(path)
    intercept[IllegalArgumentException](DeltaLite.append(spark, path,
      Seq((5L, "e", -1.0)).toDF("k", "s", "v")))
    intercept[IllegalArgumentException](DeltaLite.merge(spark, path,
      Seq((1L, "A", -9.0)).toDF("k", "s", "v"), Seq("k")))
    intercept[IllegalArgumentException](DeltaLite.update(spark, path,
      col("k") === 1L, Map("v" -> lit(-5.0))))
    assert(DeltaLite.latestVersion(path) === before)

    // constraints replay from the log (fresh snapshot) and drop cleanly
    assert(DeltaLite.snapshot(path).constraints.keySet ===
      Set("v_positive", "k_not_null"))
    DeltaLite.dropConstraint(path, "v_positive")
    DeltaLite.append(spark, path, Seq((5L, "e", -1.0)).toDF("k", "s", "v"))
    assert(DeltaLite.read(spark, path).count() === 5)

    // push past the checkpoint interval (10): the surviving constraint
    // must replay from the CHECKPOINT metaData, not just raw commits
    (0 until 5).foreach { i =>
      DeltaLite.append(spark, path, Seq((10L + i, "x", 1.0)).toDF("k", "s", "v"))
    }
    assert(DeltaLite.latestVersion(path).exists(_ >= 10L))
    assert(DeltaLite.snapshot(path).constraints.keySet === Set("k_not_null"))
    intercept[IllegalArgumentException](DeltaLite.append(spark, path,
      Seq((Option.empty[Long], "z", 1.0)).toDF("k", "s", "v")))
  }

  test("DeltaLite: schema enforcement rejects unknown columns and lossy casts") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_enforce").toString
    DeltaLite.create(spark, path, Seq((1L, 1.0)).toDF("k", "v"))
    // unknown column: refused on append, accepted via appendEvolve
    intercept[IllegalArgumentException](DeltaLite.append(spark, path,
      Seq((2L, 2.0, "extra")).toDF("k", "v", "note")))
    DeltaLite.appendEvolve(spark, path, Seq((2L, 2.0, "extra")).toDF("k", "v", "note"))
    assert(DeltaLite.read(spark, path).columns.toSeq === Seq("k", "v", "note"))
    // lossy type (double → long position of k) refused; widening (int → long) fine
    intercept[IllegalArgumentException](DeltaLite.append(spark, path,
      Seq((3.5, 3.0)).toDF("k", "v")))
    DeltaLite.append(spark, path, Seq((4, 4.0)).toDF("k", "v"))
    assert(DeltaLite.read(spark, path).count() === 3)
  }

  test("graft-delta is a registered Spark format: load, time travel, DV reads") {
    import spark.implicits._
    import graft.sources.GraftDeltaSource
    val path = Files.createTempDirectory("graft_test_format").toString
    DeltaLite.create(spark, path, Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"))
    DeltaLite.append(spark, path, Seq((3L, "c", 3.0)).toDF("k", "s", "v"))

    // format(...) resolves through the service loader, matches the native read
    val viaFormat = spark.read.format("graft-delta").load(path)
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(viaFormat === Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))

    // versionAsOf option = S5 time travel
    assert(spark.read.format("graft-delta").option("versionAsOf", 0)
      .load(path).count() === 2)

    // filter + projection run through PrunedFilteredScan (file pruning +
    // in-scan pushdown) and still return exact rows
    assert(spark.read.format("graft-delta").load(path)
      .filter(col("k") >= 2L).select("s").as[String].collect().sorted.toSeq ===
      Seq("b", "c"))

    // deletion vectors apply on the format read path too
    DeltaLite.deleteVectorized(spark, path, col("k") === 2L)
    assert(spark.read.format("graft-delta").load(path)
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 3L))

    // a user-supplied divergent schema is refused (the log owns the schema)
    intercept[IllegalArgumentException](spark.read.format("graft-delta")
      .schema("k LONG, wrong STRING").load(path).count())

    // filter → stat-bound translation (file pruning) is conservative
    import org.apache.spark.sql.sources._
    val bounds = GraftDeltaSource.boundsFromFilters(Seq(
      EqualTo("k", 5L), GreaterThan("v", 1.0),
      And(LessThanOrEqual("k", 9L), IsNotNull("s")),
      Or(EqualTo("k", 1L), EqualTo("k", 2L)))) // disjunction: no bound
    assert(bounds === Seq(
      DeltaLite.ColumnBound("k", Some(5L), Some(5L)),
      DeltaLite.ColumnBound("v", Some(1.0), None),
      DeltaLite.ColumnBound("k", None, Some(9L))))
  }

  test("graft-delta via SQL DDL: CREATE TABLE ... USING resolves the format") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_ddl").toString
    DeltaLite.create(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    spark.sql(s"""CREATE TABLE graft_ddl USING `graft-delta`
                  OPTIONS (path '$path')""")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft_ddl").head().getLong(0) === 2)
      assert(spark.sql("SELECT s FROM graft_ddl WHERE k = 2").head().getString(0) === "b")
      // writes through the log are visible to the SQL table (no caching)
      DeltaLite.append(spark, path, Seq((3L, "c")).toDF("k", "s"))
      spark.sql("REFRESH TABLE graft_ddl")
      assert(spark.sql("SELECT count(*) AS n FROM graft_ddl").head().getLong(0) === 3)
      // CTAS through the registered format: the SELECT materializes as a
      // brand-new log-committed table
      val ctas = Files.createTempDirectory("graft_test_ctas").toString + "/t"
      spark.sql(s"""CREATE TABLE graft_ctas USING `graft-delta`
                    OPTIONS (path '$ctas')
                    AS SELECT k, upper(s) AS s FROM graft_ddl WHERE k <= 2""")
      try {
        assert(DeltaLite.latestVersion(ctas) === Some(0L))
        assert(spark.sql("SELECT s FROM graft_ctas WHERE k = 1")
          .head().getString(0) === "A")
        assert(DeltaLite.read(spark, ctas).count() === 2)
      } finally spark.sql("DROP TABLE graft_ctas")
    } finally spark.sql("DROP TABLE graft_ddl")
  }

  test("graft-delta write side: SaveMode create/append/overwrite through the log") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_fmt_write").toString
    Seq((1L, 1.0)).toDF("k", "v")
      .write.format("graft-delta").mode("errorifexists")
      .option("tblproperty.graft.bloom.columns", "k")
      .option("tblproperty.team", "ingest")
      .save(path)
    // tblproperty.* options land as table properties (keys arrive
    // lowercased through Spark's option map; lookups are case-insensitive)
    val created = DeltaLite.snapshot(path)
    assert(created.properties.get("team").contains("ingest"))
    assert(created.files.forall(_.bloom.nonEmpty),
      "bloom columns configured at create must index the first write")
    Seq((2L, 2.0)).toDF("k", "v")
      .write.format("graft-delta").mode("append").save(path)
    assert(spark.read.format("graft-delta").load(path).count() === 2)
    intercept[IllegalArgumentException](Seq((9L, 9.0)).toDF("k", "v")
      .write.format("graft-delta").mode("errorifexists").save(path))
    // append goes through enforcement: unknown column rejected
    intercept[IllegalArgumentException](Seq((3L, 3.0, "x")).toDF("k", "v", "z")
      .write.format("graft-delta").mode("append").save(path))
    // overwrite = full replaceWhere; history stays travelable
    Seq((7L, 7.0)).toDF("k", "v")
      .write.format("graft-delta").mode("overwrite").save(path)
    assert(spark.read.format("graft-delta").load(path)
      .as[(Long, Double)].collect().toSeq === Seq((7L, 7.0)))
    assert(spark.read.format("graft-delta").option("versionAsOf", 1)
      .load(path).count() === 2)
  }

  test("DeltaLite: reading an uncommitted version fails") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_test_delta2").toString
    DeltaLite.create(spark, path, Seq((1L, 1.0)).toDF("k", "v"))
    intercept[IllegalArgumentException](
      DeltaLite.read(spark, path, Some(7L)).count())
  }

  test("silver layer: event_id unique (dbt `unique` test)") {
    val violations = Pipeline.silverEvents(spark, sf)
      .groupBy("event_id").count().filter(col("count") > 1).count()
    assert(violations === 0)
  }

  test("star-schema FKs hold (dbt `relationships` tests)") {
    def orphans(child: String, ck: String, parent: String, pk: String): Long =
      Tables.t(spark, sf, child).select(col(ck))
        .join(Tables.t(spark, sf, parent), col(ck) === col(pk), "left_anti")
        .count()
    assert(orphans("nation", "n_regionkey", "region", "r_regionkey") === 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") === 0)
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") === 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") === 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") === 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") === 0)
  }

  test("accepted_values (dbt test) on enum-ish columns") {
    assert(Tables.t(spark, sf, "orders")
      .filter(!col("o_orderstatus").isin("F", "O", "P")).count() === 0)
    assert(Tables.t(spark, sf, "lineitem")
      .filter(!col("l_returnflag").isin("A", "N", "R")).count() === 0)
  }

  test("gold daily revenue equals recomputation from silver-free path") {
    val gold = Pipeline.goldDailyRevenue(spark, sf)
    val direct = Tables.t(spark, sf, "lineitem").count()
    assert(gold.agg(sum(col("n_items"))).head().getLong(0) === direct)
  }

  test("Pipeline.runAll materializes the DAG as versioned tables (dbt run)") {
    val target = Files.createTempDirectory("graft_dag").toString
    val tables = Pipeline.runAll(spark, sf, target)
    assert(tables.keySet === Set("bronze_events", "silver_events",
      "gold_daily_revenue", "gold_daily_events"))
    val gold = DeltaLite.read(spark, tables("gold_daily_revenue"))
    val direct = Pipeline.goldDailyRevenue(spark, sf)
    assert(gold.count() === direct.count())
    assert(gold.agg(sum(col("n_items"))).head().getLong(0) ===
      direct.agg(sum(col("n_items"))).head().getLong(0))
    // every model is a committed DeltaLite version 0
    tables.values.foreach(p => assert(DeltaLite.latestVersion(p) === Some(0L)))
    // ref() lineage: gold_daily_events was built FROM the materialized
    // silver table, so recomputing from it matches exactly
    val silver = DeltaLite.read(spark, tables("silver_events"))
    val goldEvents = DeltaLite.read(spark, tables("gold_daily_events"))
    val expect = silver
      .groupBy(col("ts_sec").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("round((sum(value))*100)/100").as("sum_value"))
    assert(goldEvents.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(goldEvents).count() === 0)
    // EP1 lifecycle artifacts: manifest.json round-trips the DAG,
    // run_results.json the per-model outcomes (dbt node-id convention)
    locally {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      def readJson(f: String): JValue = JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(target, f)), "UTF-8"))
      def asLong(j: JValue): Long = j match {
        case JInt(x) => x.toLong; case JLong(x) => x
        case other => fail(s"not a number: $other")
      }
      val manifest = readJson("manifest.json")
      val nodes = (manifest \ "nodes").asInstanceOf[JObject].obj.toMap
      assert(nodes.keySet === tables.keySet.map(n => s"model.graft.$n"))
      val dagDeps = Pipeline.dag(sf).map(m => s"model.graft.${m.name}" ->
        m.deps.map(d => s"model.graft.$d").toSet).toMap
      nodes.foreach { case (id, node) =>
        val deps = (node \ "depends_on" \ "nodes") match {
          case JArray(xs) => xs.collect { case JString(x) => x }.toSet
          case _ => Set.empty[String]
        }
        assert(deps === dagDeps(id), s"manifest deps must round-trip for $id")
      }
      val childMap = (manifest \ "child_map").asInstanceOf[JObject].obj.toMap
      assert((childMap("model.graft.bronze_events") match {
        case JArray(xs) => xs.collect { case JString(x) => x }.toSet
        case _ => Set.empty[String]
      }) === Set("model.graft.silver_events"))
      val rr = (readJson("run_results.json") \ "results").asInstanceOf[JArray].arr
      assert(rr.size === 4)
      rr.foreach(r => assert((r \ "status") === JString("success")))
      val rowsById = rr.map(r => (r \ "unique_id").asInstanceOf[JString].s ->
        asLong(r \ "adapter_response" \ "rows_affected")).toMap
      tables.foreach { case (n, p) =>
        assert(rowsById(s"model.graft.$n") === DeltaLite.read(spark, p).count(),
          s"run_results rows_affected must match the materialized table for $n")
      }
    }
    // a ref cycle is rejected up front, not deadlocked
    val cyclic = intercept[IllegalArgumentException] {
      Pipeline.run(spark, Seq(
        Pipeline.Model("a", Seq("b"), (_, r) => r("b")),
        Pipeline.Model("b", Seq("a"), (_, r) => r("a"))),
        Files.createTempDirectory("graft_cycle").toString)
    }
    assert(cyclic.getMessage.contains("ref cycle"))
    // a failing model fails the run with ITS error, not a timeout/hang
    val boom = intercept[RuntimeException] {
      Pipeline.run(spark, Seq(
        Pipeline.Model("ok", Nil, (s, _) => Pipeline.bronzeEvents(s, sf)),
        Pipeline.Model("bad", Seq("ok"), (_, _) => sys.error("model exploded"))),
        Files.createTempDirectory("graft_fail").toString)
    }
    assert(boom.getMessage.contains("model exploded"))
  }

  test("Pipeline grants config compiles to S63 properties: grant, role exemption, revoke by omission") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft_grants").toString
    def model(g: Option[Map[String, String]]) = Pipeline.Model("contacts",
      Nil, (s, _) => { import s.implicits._
        Seq((1L, "25-989-741-2988", 100.0), (2L, "13-555-123-4567", -5.0))
          .toDF("id", "phone", "bal") },
      grants = g)
    def contacts(g: Map[String, String]) = model(Some(g))
    val path = s"$target/contacts"
    // GRANT: model config -> table properties at materialization
    Pipeline.run(spark, Seq(contacts(Map(
      "graft.rowFilter" -> "bal >= 0.0",
      "graft.mask.phone" -> "last4",
      "graft.maskExempt.phone" -> "support",
      "graft.roles.support" -> "carol"))), target)
    val props = DeltaLite.snapshot(path).properties
    assert(props.get("graft.rowFilter") === Some("bal >= 0.0") &&
      props.get("graft.mask.phone") === Some("last4") &&
      props.get("graft.roles.support") === Some("carol"),
      s"grants config must round-trip into TBLPROPERTIES: $props")
    val served = DeltaLite.read(spark, path).orderBy($"id").collect()
    assert(served.map(_.getLong(0)).toSeq === Seq(1L) &&
      served(0).getString(1) === "***********2988",
      "the compiled policy governs serving reads immediately")
    spark.conf.set("spark.graft.principal", "carol")
    try assert(DeltaLite.read(spark, path).collect()(0).getString(1)
      === "25-989-741-2988",
      "role-in-exemption-list: a member of the granted role reads raw")
    finally spark.conf.unset("spark.graft.principal")
    // REVOCATION BY OMISSION: a re-run whose config drops the role
    // grant revokes it; undeclared governance keys are removed
    Pipeline.run(spark, Seq(contacts(Map(
      "graft.rowFilter" -> "bal >= 0.0",
      "graft.mask.phone" -> "last4"))), target)
    val props2 = DeltaLite.snapshot(path).properties
    assert(!props2.contains("graft.roles.support") &&
      !props2.contains("graft.maskExempt.phone"),
      s"omitted grants must revoke: $props2")
    spark.conf.set("spark.graft.principal", "carol")
    try assert(DeltaLite.read(spark, path).collect()(0).getString(1)
      === "***********2988", "the revoked role member is governed again")
    finally spark.conf.unset("spark.graft.principal")
    // EXPLICIT empty config (Some(Map.empty)) revokes the whole policy
    // surface — "managed and empty"
    Pipeline.run(spark, Seq(contacts(Map.empty)), target)
    assert(!DeltaLite.snapshot(path).properties.keys
      .exists(k => k.startsWith("graft.mask") || k == "graft.rowFilter"))
    assert(DeltaLite.read(spark, path).count() === 2)
    // UNMANAGED (grants = None, the default): a rebuild must NOT touch
    // policy set out-of-band — "no config" is not "revoke everything"
    DeltaLite.setProperties(path, Map("graft.mask.phone" -> "null"))
    Pipeline.run(spark, Seq(model(None)), target)
    assert(DeltaLite.snapshot(path).properties
      .get("graft.mask.phone") === Some("null"),
      "an unmanaged model must leave admin-set policy alone")
    DeltaLite.unsetProperty(path, "graft.mask.phone")
    // grants ride the FINGERPRINT: under state:modified+ a config-only
    // edit rebuilds (and re-syncs) the model; an unchanged config reuses
    Pipeline.run(spark, Seq(contacts(Map("graft.mask.phone" -> "last4"))),
      target, selective = true)
    val vAfterGrant = DeltaLite.snapshot(path).version
    Pipeline.run(spark, Seq(contacts(Map("graft.mask.phone" -> "last4"))),
      target, selective = true)
    assert(DeltaLite.snapshot(path).version === vAfterGrant,
      "an unchanged model+grants must reuse, not rebuild")
    Pipeline.run(spark, Seq(contacts(Map.empty)), target, selective = true)
    assert(!DeltaLite.snapshot(path).properties.contains("graft.mask.phone"),
      "a grants-only edit must re-fingerprint, rebuild and revoke")
    // non-governance keys are rejected at declaration — grants manage
    // policy, not arbitrary properties
    val bad = intercept[RuntimeException] {
      Pipeline.run(spark, Seq(contacts(Map("team" -> "ingest"))), target)
    }
    assert(bad.getMessage.contains("not a governance property"))
  }

  test("function models (dbt python-model twin): language rides the manifest, state:modified+ applies, code edits rebuild exactly the function model") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_fnmodel").toString
    def statuses(): Map[String, String] = {
      val rr = (JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(target, "run_results.json")), "UTF-8"))
        \ "results").asInstanceOf[JArray].arr
      rr.map(r => (r \ "unique_id").asInstanceOf[JString].s
        .stripPrefix("model.graft.") ->
        (r \ "status").asInstanceOf[JString].s).toMap
    }
    val silver = Pipeline.Model("fn_silver", Nil,
      (s2, _) => Tables.t(s2, sf, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")),
      code = "select o_custkey, count(*) as n from orders group by 1")
    val fn = Pipeline.Model("fn_gold", Seq("fn_silver"),
      (s2, ref) => {
        // imperative authoring — the python-model shape
        var d = ref("fn_silver")
        for (t <- Seq(3L, 10L))
          d = d.withColumn(s"ge_$t", col("n") >= t)
        d
      },
      code = "def model(ref): threshold flags [3,10] v1",
      language = "scala")
    Pipeline.run(spark, Seq(silver, fn), target, selective = true)
    assert(statuses().values.forall(_ == "success"))
    // manifest records language per node, like dbt's
    val nodes = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target, "manifest.json")), "UTF-8")) \ "nodes"
    def lang(n: String): String =
      (nodes \ s"model.graft.$n" \ "language").asInstanceOf[JString].s
    assert(lang("fn_silver") === "sql" && lang("fn_gold") === "scala")
    // unchanged rerun: the function model reuses like any other node
    Pipeline.run(spark, Seq(silver, fn), target, selective = true)
    assert(statuses().values.forall(_ == "reused"))
    // a code edit (the author's checksum obligation) rebuilds exactly
    // it — same schema, doubled thresholds (the in-place rebuild is
    // replaceWhere: schema changes are a different, gated migration)
    val edited = fn.copy(
      code = "def model(ref): threshold flags, doubled thresholds v2",
      build = (s2, ref) => {
        var d = ref("fn_silver")
        for (t <- Seq(3L, 10L))
          d = d.withColumn(s"ge_$t", col("n") >= t * 2)
        d
      })
    Pipeline.run(spark, Seq(silver, edited), target, selective = true)
    assert(statuses() === Map("fn_silver" -> "reused", "fn_gold" -> "success"))
    assert(DeltaLite.read(spark, s"$target/fn_gold")
      .filter(col("n") >= 3 && col("n") < 6 && col("ge_3")).count() === 0L,
      "the rebuilt function model must reflect the doubled threshold")
    // declaration gates: unknown language; scala model without code text
    intercept[IllegalArgumentException] {
      Pipeline.Model("bad", Nil, (s2, _) => spark.range(1).toDF(),
        language = "python")
    }
    intercept[IllegalArgumentException] {
      Pipeline.Model("bad2", Nil, (s2, _) => spark.range(1).toDF(),
        language = "scala")
    }
  }

  test("Pipeline selective rebuild (state:modified+): editing one model rebuilds only its subtree") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_state").toString
    val names = Seq("bronze_events", "silver_events", "gold_daily_revenue",
      "gold_daily_events")
    def version(n: String): Long =
      DeltaLite.latestVersion(s"$target/$n").get
    def statuses(): Map[String, String] = {
      val rr = (JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(target, "run_results.json")), "UTF-8"))
        \ "results").asInstanceOf[JArray].arr
      rr.map(r => (r \ "unique_id").asInstanceOf[JString].s
        .stripPrefix("model.graft.") ->
        (r \ "status").asInstanceOf[JString].s).toMap
    }
    // first selective run: nothing materialized — every model builds
    Pipeline.runAll(spark, sf, target, selective = true)
    names.foreach(n => assert(version(n) === 0L))
    assert(statuses().values.forall(_ == "success"))
    // unchanged rerun: full cache hit — ZERO new commits on any table
    Pipeline.runAll(spark, sf, target, selective = true)
    names.foreach(n => assert(version(n) === 0L, s"$n must not recommit"))
    assert(statuses().values.forall(_ == "reused"))
    // edit the mid-DAG silver model (code + behavior change together, as
    // an edited SQL file would): silver and its descendant gold rebuild;
    // the upstream bronze and the independent revenue branch do not
    val edited = Pipeline.dag(sf).map {
      case m if m.name == "silver_events" => m.copy(
        code = m.code + " -- v2: double the value column",
        build = (s, ref) => ref("bronze_events")
          .withColumn("ts_sec", date_trunc("second", col("ts")))
          .dropDuplicates("event_id")
          .filter(col("event_type").isNotNull && col("value").isNotNull)
          .withColumn("value", col("value") * 2))
      case m => m
    }
    Pipeline.run(spark, edited, target, selective = true)
    assert(version("bronze_events") === 0L, "upstream must not rebuild")
    assert(version("gold_daily_revenue") === 0L,
      "the independent branch must not rebuild")
    // stale rebuild = replaceWhere commit + fingerprint-stamp commit
    assert(version("silver_events") === 2L)
    assert(version("gold_daily_events") === 2L)
    assert(statuses() === Map("bronze_events" -> "reused",
      "gold_daily_revenue" -> "reused", "silver_events" -> "success",
      "gold_daily_events" -> "success"))
    // the rebuilt gold reflects the edit THROUGH the materialized ref
    val doubled = DeltaLite.read(spark, s"$target/gold_daily_events")
    val expect = DeltaLite.read(spark, s"$target/silver_events")
      .groupBy(col("ts_sec").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("round((sum(value))*100)/100").as("sum_value"))
    assert(doubled.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(doubled).count() === 0)
    // the edited state is itself stable: rerun reuses everything again
    Pipeline.run(spark, edited, target, selective = true)
    assert(version("silver_events") === 2L)
    assert(version("gold_daily_events") === 2L)
    assert(statuses().values.forall(_ == "reused"))
    // time travel still serves the PRE-edit silver (rebuild-in-place
    // keeps history; version 0 is the original materialization)
    val preEdit = DeltaLite.read(spark, s"$target/silver_events",
      asOf = Some(0L))
    val postEdit = DeltaLite.read(spark, s"$target/silver_events")
    assert(math.abs(preEdit.agg(sum(col("value"))).head().getDouble(0) * 2 -
      postEdit.agg(sum(col("value"))).head().getDouble(0)) < 1e-6)
  }

  test("dbt vars/env_var: template rendering, compile-time failure on unbound") {
    import Pipeline.renderVars
    // var with binding, var with default, both quote styles, bare token
    assert(renderVars("where day >= '{{ var('cutoff') }}'",
      Map("cutoff" -> "1995-01-01")) === "where day >= '1995-01-01'")
    assert(renderVars("limit {{ var('n', 10) }}", Map.empty) === "limit 10")
    assert(renderVars("{{ var('a', 'x') }}/{{ var('b', \"y\") }}",
      Map.empty) === "x/y")
    // binding beats default (dbt precedence)
    assert(renderVars("{{ var('n', 10) }}", Map("n" -> "99")) === "99")
    // env_var reads the (injected) environment, default as fallback
    assert(renderVars("schema_{{ env_var('GRAFT_ENV') }}", Map.empty,
      env = Map("GRAFT_ENV" -> "prod")) === "schema_prod")
    assert(renderVars("{{ env_var('GRAFT_MISSING', 'dev') }}", Map.empty,
      env = Map.empty) === "dev")
    // unbound + no default = compile error naming the reference
    val e1 = intercept[IllegalArgumentException] {
      renderVars("{{ var('nope') }}", Map.empty) }
    assert(e1.getMessage.contains("var 'nope'"))
    val e2 = intercept[IllegalArgumentException] {
      renderVars("{{ env_var('NOPE') }}", Map.empty, env = Map.empty) }
    assert(e2.getMessage.contains("env_var 'NOPE'"))
    // text without templates passes through untouched
    val plain = "select * from t where x = '{{ this }}'"
    assert(renderVars(plain, Map.empty) === plain)
  }

  test("dbt vars: a var flip rebuilds exactly the consuming subtree") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_vars").toString
    def statuses(): Map[String, String] = {
      val rr = (JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(target, "run_results.json")), "UTF-8"))
        \ "results").asInstanceOf[JArray].arr
      rr.map(r => (r \ "unique_id").asInstanceOf[JString].s
        .stripPrefix("model.graft.") ->
        (r \ "status").asInstanceOf[JString].s).toMap
    }
    // `recent_events` consumes var('min_value'); `event_domains` does
    // not; `recent_summary` refs the consumer (descendant rebuilds ride
    // the transitive fingerprint, its own code mentions no var)
    val models = Seq(
      Pipeline.Model("raw_events", Nil,
        (s, _) => Pipeline.bronzeEvents(s, sf),
        code = "select * from source(events)"),
      Pipeline.Model("recent_events", Seq("raw_events"),
        (_, _) => sys.error("buildV takes precedence over build"),
        code = "select * from ref(raw_events) " +
          "where value >= {{ var('min_value') }}",
        buildV = Some((s, ref, varOf) =>
          ref("raw_events").filter(col("value") >= varOf("min_value").toDouble))),
      Pipeline.Model("event_domains", Seq("raw_events"), (s, ref) =>
        ref("raw_events").select(col("event_type")).distinct(),
        code = "select distinct event_type from ref(raw_events)"),
      Pipeline.Model("recent_summary", Seq("recent_events"), (s, ref) =>
        ref("recent_events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n")),
        code = "select event_type, count(*) as n " +
          "from ref(recent_events) group by 1"))
    // first run at min_value=10: everything builds; the manifest records
    // the binding and the RENDERED compiled_code
    Pipeline.run(spark, models, target, selective = true,
      vars = Map("min_value" -> "10"))
    assert(statuses().values.forall(_ == "success"))
    val manifest = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(target, "manifest.json")), "UTF-8"))
    assert((manifest \ "metadata" \ "vars" \ "min_value")
      .asInstanceOf[JString].s === "10")
    assert((manifest \ "nodes" \ "model.graft.recent_events" \
      "compiled_code").asInstanceOf[JString].s.contains("value >= 10"))
    val v10 = DeltaLite.read(spark, s"$target/recent_events").count()
    // same vars rerun: full cache hit
    Pipeline.run(spark, models, target, selective = true,
      vars = Map("min_value" -> "10"))
    assert(statuses().values.forall(_ == "reused"))
    // var flip: the consumer and its descendant rebuild; the upstream
    // source and the var-free sibling reuse
    Pipeline.run(spark, models, target, selective = true,
      vars = Map("min_value" -> "50"))
    assert(statuses() === Map("raw_events" -> "reused",
      "event_domains" -> "reused", "recent_events" -> "success",
      "recent_summary" -> "success"))
    val v50 = DeltaLite.read(spark, s"$target/recent_events").count()
    assert(v50 < v10, "the tighter cutoff must drop rows")
    // the rebuilt materialization actually reflects the new binding
    assert(DeltaLite.read(spark, s"$target/recent_events")
      .filter(col("value") < 50).count() === 0)
    // an unbound required var fails the invocation BEFORE any build:
    // no new commits anywhere
    val before = DeltaLite.latestVersion(s"$target/recent_events").get
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, models, target, selective = true) }
    assert(e.getMessage.contains("min_value"))
    assert(DeltaLite.latestVersion(s"$target/recent_events").get === before)
  }

  test("dbt --state slim CI: state:modified diffs manifests; runSelect builds only the blast radius") {
    val prod = Files.createTempDirectory("graft_state_prod").toString
    val ci = Files.createTempDirectory("graft_state_ci").toString
    val models = Pipeline.dag(sf)
    // production run records per-node fingerprints in manifest.json
    Pipeline.run(spark, models, prod)
    // unchanged code against prod state: nothing is modified
    assert(Pipeline.select(models, "state:modified",
      state = Some(prod)).isEmpty)
    // edit the mid-DAG model: modified = exactly it; + closure adds its
    // descendant, not the upstream or the independent branch
    val edited = models.map {
      case m if m.name == "silver_events" =>
        m.copy(code = m.code + " -- ci edit")
      case m => m
    }
    assert(Pipeline.select(edited, "state:modified", state = Some(prod))
      .map(_.name) === Seq("silver_events"))
    assert(Pipeline.select(edited, "state:modified+", state = Some(prod))
      .map(_.name).toSet === Set("silver_events", "gold_daily_events"))
    // a VAR flip is a modification too (fingerprints hash rendered code)
    val varred = models.map {
      case m if m.name == "gold_daily_revenue" =>
        m.copy(code = m.code + " limit {{ var('cap', 10) }}")
      case m => m
    }
    Pipeline.run(spark, varred, prod, vars = Map("cap" -> "10"))
    assert(Pipeline.select(varred, "state:modified", state = Some(prod),
      vars = Map("cap" -> "10")).isEmpty)
    assert(Pipeline.select(varred, "state:modified", state = Some(prod),
      vars = Map("cap" -> "99")).map(_.name) === Seq("gold_daily_revenue"))
    // slim CI: runSelect state:modified+ builds ONLY the subtree into a
    // fresh CI target; unselected upstreams defer to EXISTING
    // materializations — clone them first (the dbt clone + defer combo).
    // Restore prod's manifest to the UNvarred DAG first (the var run
    // above legitimately re-checksummed gold_daily_revenue)
    Pipeline.run(spark, models, prod)
    Pipeline.cloneEnv(spark, prod, ci, edited)
    Pipeline.runSelect(spark, edited, ci, "state:modified+",
      state = Some(prod))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rr = (JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ci, "run_results.json")), "UTF-8"))
      \ "results").asInstanceOf[JArray].arr
    val statuses = rr.map(r => (r \ "unique_id").asInstanceOf[JString].s
      .stripPrefix("model.graft.") ->
      (r \ "status").asInstanceOf[JString].s).toMap
    assert(statuses("silver_events") === "success")
    assert(statuses("gold_daily_events") === "success")
    assert(statuses("bronze_events") === "deferred")
    assert(statuses("gold_daily_revenue") === "deferred")
    // missing state dir refuses loudly
    val e = intercept[IllegalArgumentException] {
      Pipeline.select(models, "state:modified") }
    assert(e.getMessage.contains("--state"))
  }

  test("dbt compile: rendered per-model artifacts with refs resolved, zero execution") {
    val target = Files.createTempDirectory("graft_compile").toString
    val models = Pipeline.dag(sf).map {
      case m if m.name == "gold_daily_events" => m.copy(
        code = m.code + " limit {{ var('row_cap', 1000) }}")
      case m => m
    }
    val out = Pipeline.compile(models, target, vars = Map("row_cap" -> "7"))
    assert(out.keySet === models.map(Pipeline.nodeId).toSet)
    def text(n: String): String = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(out(n))), "UTF-8")
    // ref() resolves to the quoted materialization path the run would read
    assert(text("silver_events").contains(s"'$target/bronze_events'"))
    assert(!text("silver_events").contains("ref(bronze_events)"))
    // vars render; the depends_on header names resolved node ids
    assert(text("gold_daily_events").contains("limit 7"))
    assert(text("gold_daily_events").contains("-- depends_on: silver_events"))
    // nothing executed: no tables, no run artifacts
    assert(DeltaLite.latestVersion(s"$target/bronze_events").isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(target, "run_results.json")))
    // the run-time validations gate the artifact: unknown ref, access
    // violation, unbound var all refuse
    intercept[IllegalArgumentException] {
      Pipeline.compile(Seq(Pipeline.Model("x", Seq("nope"),
        (s, _) => Pipeline.bronzeEvents(s, sf))), target)
    }
    // with the default present an unbound run compiles (default used)…
    assert(Pipeline.compile(models, target)("gold_daily_events").nonEmpty)
    assert(text("gold_daily_events").contains("limit 1000"))
    // …without it, an unbound var refuses at compile time
    intercept[IllegalArgumentException] {
      Pipeline.compile(models.map {
        case m if m.name == "gold_daily_events" =>
          m.copy(code = m.code.replace("{{ var('row_cap', 1000) }}",
            "{{ var('row_cap') }}"))
        case m => m
      }, target)
    }
  }

  test("multimodal: stub decode plumbing (schema, batches, frames)") {
    implicit val s = spark
    val media = graft.functions.Multimodal.asMediaTable(
      Tables.t(spark, sf, "documents"), "doc_id", "text")
    assert(media.schema.fieldNames.toSeq === Seq("id", "media", "meta"))
    val feats = graft.functions.Multimodal.extractFeatures(media)
    val row = feats.filter(col("id") === 0).head()
    assert(row.features.length === 8)
    assert(row.n_bytes > 0)
    // deterministic across runs
    val again = graft.functions.Multimodal.extractFeatures(media)
      .filter(col("id") === 0).head()
    assert(row.features.toSeq === again.features.toSeq)
    val frames = graft.functions.Multimodal.sampleFrames(media, 64, 2)
    assert(frames.count() > 0)
    assert(frames.schema.fieldNames.toSeq ===
      Seq("id", "frame_idx", "frame_bytes", "frame_features"))
    // resize: payload decimated, dims scaled, schema preserved
    val resized = graft.functions.Multimodal.resizeStub(media, 4)
    assert(resized.schema.fieldNames.toSeq === Seq("id", "media", "meta"))
    val (origLen, resLen) = (
      media.filter(col("id") === 0).select(length(col("media"))).head().getInt(0),
      resized.filter(col("id") === 0).select(length(col("media"))).head().getInt(0))
    assert(resLen === origLen / 4)
  }

  test("ANALYZE TABLE: one-scan NDV/null stats land in properties; CBO reads serve them as ColumnStats") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_analyze")
      .toString + "/t"
    DeltaLite.create(spark, path,
      (0L until 1000L).map(i => (i, i % 10,
        if (i % 4 == 0) None else Some(s"u${i % 25}")))
        .toDF("id", "bucket", "tag"))
    // SQL surface returns the commit version of the stats property
    val v = spark.sql(
      s"ANALYZE TABLE '$path' COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect()(0).getLong(0)
    assert(v === 1L)
    val parsed = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)
    assert(parsed("id").nulls.contains(0L))
    assert(parsed("id").ndv.exists(n => n > 900 && n < 1100),
      s"HLL ndv ±5%: ${parsed("id").ndv}")
    assert(parsed("bucket").ndv.exists(n => n >= 9 && n <= 11))
    val tag = parsed("tag")
    assert(tag.nulls.contains(250L), s"exact null count: ${tag.nulls}")
    assert(tag.ndv.exists(n => n >= 23 && n <= 27))
    assert(tag.avgLen.exists(_ >= 2L) && tag.maxLen.exists(_ >= 3L))
    assert(tag.hll.nonEmpty, "strings carry the mergeable sketch")
    // CBO reads merge analyzed NDV/nulls with LIVE file min/max
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      val st = DeltaLite.read(ss, path).queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(1000)))
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      assert(byName("bucket").distinctCount.exists(n => n >= 9 && n <= 11))
      assert(byName("bucket").min.contains(0L) &&
        byName("bucket").max.contains(9L),
        s"live log min/max must ride along: ${byName("bucket")}")
      assert(byName("tag").nullCount.contains(BigInt(250)))
      // equality selectivity prices bucket = 3 at rows/ndv ≈ 100
      val eq = DeltaLite.read(ss, path).filter(col("bucket") === 3L)
        .queryExecution.optimizedPlan.stats
      assert(eq.rowCount.exists(rc => rc >= 80 && rc <= 120),
        s"NDV equality estimate must land near 100, got $eq")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    // FOR COLUMNS subset re-analyzes only the named columns and keeps
    // the rest (warehouse ANALYZE semantics); unknown columns refuse
    spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS FOR COLUMNS (bucket)")
      .collect()
    val again = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)
    assert(again.keySet === Set("id", "bucket", "tag"))
    assert(again("bucket").ndv.exists(n => n >= 9 && n <= 11))
    assert(again("tag").nulls.contains(250L), "untouched columns carry over")
  }

  test("auto-stats fold covers the WHOLE append family: appendOnce (streaming) and appendEvolve fold; txn replays don't") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_foldfam")
      .toString + "/t"
    DeltaLite.create(spark, path,
      (0L until 400L).map(i => (i, i % 20)).toDF("k", "v"),
      properties = Map("graft.stats.auto" -> "true"))
    DeltaLite.analyzeTable(spark, path)
    def stats() =
      DeltaLite.parseColStatsFull(DeltaLite.snapshot(path).properties)
    assert(stats()._1 === 400L)
    // a STREAMING-path write (appendOnce, exactly-once txn) folds like
    // a batch append — a gate table under graft.stats.auto maintains
    // stats through its micro-batches
    DeltaLite.appendOnce(spark, path,
      (400L until 500L).map(i => (i, i % 20)).toDF("k", "v"),
      "gate_app", 1L)
    val s1 = stats()
    assert(s1._1 === 500L, "appendOnce must fold the batch's rows")
    assert(s1._2("k").ndv.exists(n => n > 460 && n < 540),
      s"appendOnce must fold ndv to ~500, got ${s1._2("k").ndv}")
    // a REPLAYED txn is a data no-op and must be a stats no-op too
    val before = DeltaLite.snapshot(path).properties(DeltaLite.ColStatsKey)
    DeltaLite.appendOnce(spark, path,
      (400L until 500L).map(i => (i, i % 20)).toDF("k", "v"),
      "gate_app", 1L)
    assert(DeltaLite.snapshot(path).properties(DeltaLite.ColStatsKey)
      === before, "a replayed appendOnce must not double-fold")
    // schema-evolving append folds the EXISTING columns' stats (the new
    // column has none until the next ANALYZE)
    DeltaLite.appendEvolve(spark, path,
      (500L until 600L).map(i => (i, i % 20, s"n$i"))
        .toDF("k", "v", "note"))
    val s2 = stats()
    assert(s2._1 === 600L, "appendEvolve must fold the batch's rows")
    assert(s2._2("k").ndv.exists(n => n > 550 && n < 650),
      s"appendEvolve must fold ndv to ~600, got ${s2._2("k").ndv}")
    assert(!s2._2.contains("note"),
      "the evolved column has no stats until ANALYZE")
  }

  test("row churn DISARMS the CBO stats serve path; ANALYZE re-arms; appends never trip it") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_churn")
      .toString + "/t"
    // 1000 rows, bucket 0..9 (100 each)
    DeltaLite.create(spark, path,
      (0L until 1000L).map(i => (i, i % 10)).toDF("id", "bucket"))
    DeltaLite.analyzeTable(spark, path)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      def bucketStats() = DeltaLite.read(ss, path)
        .queryExecution.optimizedPlan.stats.attributeStats
        .collectFirst { case (a, cs) if a.name == "bucket" => cs }.get
      def filterEst() = DeltaLite.read(ss, path)
        .filter(col("bucket") === 3L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      // armed: equality prices bucket = 3 at rows/ndv ≈ 100
      val armed = filterEst()
      assert(armed >= 80 && armed <= 120, s"armed estimate ~100: $armed")
      // an APPEND is no churn: stats stay armed (they fold/stay valid)
      DeltaLite.append(ss, path,
        (1000L until 1100L).map(i => (i, i % 10)).toDF("id", "bucket"))
      assert(bucketStats().distinctCount.isDefined,
        "appends must not disarm the standing stats")
      // a NO-OP churn commit (DELETE matching nothing still writes its
      // audit commit) touches no data — it must not disarm either
      DeltaLite.deleteVectorized(ss, path, col("bucket") === 999L)
      assert(bucketStats().distinctCount.isDefined,
        "a no-op delete must not disarm the standing stats")
      // DELETE half the value range: sketches can't subtract, so the
      // standing NDV(bucket)=10 would price bucket=3 at 550/10 = 55
      // while the true answer is 110 — the serve path must DISARM
      // (serve nothing) rather than mis-price from pre-delete stats
      DeltaLite.delete(ss, path, col("bucket") >= 5L)
      val disarmed = bucketStats()
      assert(disarmed.distinctCount.isEmpty && disarmed.nullCount.isEmpty,
        s"churn must disarm ANALYZE-derived NDV/nulls: $disarmed")
      assert(disarmed.min.contains(0L) && disarmed.max.contains(4L),
        s"live min/max stay (file-entry truth, always valid): $disarmed")
      val afterDelete = filterEst()
      assert(afterDelete < 40 || afterDelete > 70,
        s"the stale 10-NDV pricing (~55) must be gone, got $afterDelete")
      // EXPLAIN COST renders the SAME serving decision
      val cost = DeltaLite.explainCost(ss, path)
        .map { case (e, s, v) => (e, s) -> v }.toMap
      assert(cost(("table", "stats_serving")).startsWith("DISARMED"),
        s"explain cost must render the disarm: $cost")
      assert(cost(("table", "stats_churn_commits_since_analyze")) === "1")
      // tolerance knob: a churn budget re-serves the (estimate-grade)
      // stats for workloads that prefer stale pricing over none
      ss.conf.set("spark.graft.stats.maxChurn", "5")
      try assert(bucketStats().distinctCount.isDefined,
        "within tolerance the stats serve again")
      finally ss.conf.unset("spark.graft.stats.maxChurn")
      // ... and per-TABLE: the TBLPROPERTY overrides the session default
      DeltaLite.setProperties(path, Map("graft.stats.maxChurn" -> "5"))
      assert(bucketStats().distinctCount.isDefined,
        "the per-table tolerance property must re-serve")
      assert(DeltaLite.explainCost(ss, path).collectFirst {
        case ("table", "stats_serving", v) => v }.contains("armed"))
      DeltaLite.unsetProperty(path, "graft.stats.maxChurn")
      assert(bucketStats().distinctCount.isEmpty,
        "unsetting the property restores the disarm")
      // re-ANALYZE re-arms with post-delete truth: ndv(bucket) = 5
      DeltaLite.analyzeTable(ss, path)
      val rearmed = bucketStats()
      assert(rearmed.distinctCount.exists(n => n >= 4 && n <= 6),
        s"re-ANALYZE must re-arm with ndv≈5: $rearmed")
      val freshEst = filterEst()
      assert(freshEst >= 88 && freshEst <= 132,
        s"re-armed estimate ~110: $freshEst")
      assert(DeltaLite.explainCost(ss, path).collectFirst {
        case ("table", "stats_serving", v) => v }.contains("armed"))
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("churn REPAIR: auto-stats partitioned tables re-analyze touched partitions and re-arm") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_churnfix")
      .toString + "/t"
    // 4 partitions × 250 rows; bucket is partition-correlated: each
    // partition holds 5 of the 20 bucket values, so deleting one
    // partition REMOVES values — exactly what sketches can't subtract
    DeltaLite.create(spark, path,
      (0L until 1000L).map(i => (i, i % 20, s"p${i % 4}"))
        .toDF("id", "bucket", "part"),
      partitionBy = Seq("part"),
      properties = Map("graft.stats.auto" -> "true"))
    spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS " +
      "FOR ALL COLUMNS WITH HISTOGRAM BY PARTITION").collect()
    DeltaLite.delete(spark, path, col("part") === "p3")
    // the repair commit advanced analyzedVersion past the churn: the
    // serve path re-ARMS with repaired numbers instead of disarming
    val snap = DeltaLite.snapshot(path)
    assert(snap.churnVersions.isEmpty,
      s"repair must clear the churn, got ${snap.churnVersions}")
    val (aRows, stored) = DeltaLite.parseColStatsFull(snap.properties)
    assert(aRows === 750L, "analyzed rows re-derive post-delete")
    assert(stored("bucket").ndv.exists(n => n >= 13 && n <= 17),
      s"table NDV re-derives as the partition-HLL union (~15): " +
        s"${stored("bucket").ndv}")
    assert(stored("id").ndv.exists(n => n >= 700 && n <= 800),
      s"ndv(id) ~750: ${stored("id").ndv}")
    assert(stored("bucket").hist.isEmpty && stored("bucket").qsk.isEmpty,
      "histograms/digests describe deleted rows — they must DROP")
    // the partition column repairs EXACTLY from the log
    assert(stored(snap.phys("part")).ndv.contains(3L))
    // per-partition state: the deleted partition's entry is gone,
    // untouched partitions carried over
    val parts = DeltaLite.parsePartStats(snap.properties)
    assert(parts.size === 3 && !parts.keySet.exists(_.contains("p3")))
    // the CBO serves the repaired numbers
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      // a partitioned read serves per-branch PARTITION-LOCAL stats (the
      // union root drops distinctCount by design — NDVs don't union
      // without sketches): assert the leaves serve the repaired
      // partition-local NDV (5 bucket values per partition) instead of
      // disarming
      val leafNdvs = DeltaLite.read(ss, path).queryExecution.optimizedPlan
        .collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.stats.attributeStats.collectFirst {
              case (a, cs) if a.name == "bucket" => cs.distinctCount
            }.flatten
        }.flatten
      assert(leafNdvs.nonEmpty && leafNdvs.forall(n => n.toLong === 5L),
        s"repaired partition-local NDV must serve at the leaves: $leafNdvs")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    assert(DeltaLite.explainCost(spark, path).collectFirst {
      case ("table", "stats_serving", v) => v }.contains("armed"))
    // appends keep folding on the repaired state
    DeltaLite.append(spark, path,
      (2000L until 2100L).map(i => (i, 20L + i % 5, "p0"))
        .toDF("id", "bucket", "part"))
    val after = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)
    assert(after("bucket").ndv.exists(n => n >= 18 && n <= 22),
      s"fold over repaired sketches (~20): ${after("bucket").ndv}")
  }

  test("row churn survives a checkpoint: a cold replay still serves disarmed stats") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_churnckpt")
      .toString + "/t"
    DeltaLite.create(spark, path,                               // v0
      (0L until 400L).map(i => (i, i % 8)).toDF("id", "bucket"))
    DeltaLite.analyzeTable(spark, path)                         // v1
    DeltaLite.delete(spark, path, col("bucket") >= 4L)          // v2 CHURN
    // commits up to v10 cross the checkpoint boundary (interval 10)
    (0 until 8).foreach(i => DeltaLite.append(spark, path,      // v3..v10
      Seq((1000L + i, i % 4)).toDF("id", "bucket")))
    assert({
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(
        java.nio.file.Paths.get(path, "_graft_log")).iterator().asScala
        .exists(_.getFileName.toString.startsWith("checkpoint-10"))
    }, "precondition: a checkpoint must exist at v10")
    // a commit AFTER the checkpoint: its metaData re-states the
    // (stripped) snapshot properties, which during replay REPLACES the
    // checkpoint's properties — the carrier must be harvested when the
    // checkpoint's metaData is read, not from the final properties map,
    // or this single append silently re-arms the stale stats
    DeltaLite.append(spark, path,                               // v11
      Seq((2000L, 1L)).toDF("id", "bucket"))
    // COLD replay: starts from the checkpoint, which never replays the
    // v2 commitInfo — the churn must ride the checkpoint itself
    DeltaLite.clearSnapshotCache()
    val snap = DeltaLite.snapshot(path)
    assert(snap.churnVersions === Seq(2L),
      s"checkpoint-persisted churn must survive a cold replay: " +
        s"${snap.churnVersions}")
    assert(!snap.properties.keys.exists(_.contains("pendingChurn")),
      "the carrier key must never surface in table properties")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      val bucket = DeltaLite.read(ss, path)
        .queryExecution.optimizedPlan.stats.attributeStats
        .collectFirst { case (a, cs) if a.name == "bucket" => cs }.get
      assert(bucket.distinctCount.isEmpty,
        s"post-restart reads must still disarm the pre-delete NDV: $bucket")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    // re-ANALYZE clears the persisted churn at the next checkpoint too
    DeltaLite.analyzeTable(spark, path)
    DeltaLite.clearSnapshotCache()
    assert(DeltaLite.snapshot(path).churnVersions.isEmpty)
  }

  test("incremental stats: appends fold HLL sketches in O(batch); auto property maintains them") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_incstats")
      .toString + "/t"
    // 500 keys 0..499; tag nulls every 5th row
    DeltaLite.create(spark, path,
      (0L until 500L).map(i => (i,
        if (i % 5 == 0) None else Some(s"t${i % 40}"))).toDF("k", "tag"))
    DeltaLite.analyzeTable(spark, path)
    val v0 = DeltaLite.parseColStatsFull(DeltaLite.snapshot(path).properties)
    assert(v0._1 === 500L)
    assert(v0._2("k").ndv.exists(n => n > 470 && n < 530))
    // batch: 250 OVERLAPPING keys (250..499) + 250 new (500..749), all
    // tags non-null and longer
    val batch = (250L until 750L).map(i => (i, Some(s"tag_${i % 60}")))
      .toDF("k", "tag")
    DeltaLite.analyzeAppend(spark, path, batch)
    val v1 = DeltaLite.parseColStatsFull(DeltaLite.snapshot(path).properties)
    assert(v1._1 === 1000L, "analyzed row count accumulates")
    // union estimate sees 750 distinct keys — the overlap is NOT double
    // counted (the point of mergeable sketches)
    assert(v1._2("k").ndv.exists(n => n > 700 && n < 800),
      s"union ndv must be ~750, got ${v1._2("k").ndv}")
    assert(v1._2("tag").nulls.contains(100L), "null counts add")
    assert(v1._2("tag").maxLen.exists(_ >= 6L), "max length takes the max")
    // auto maintenance: the property makes append() fold stats itself
    DeltaLite.setProperties(path, Map("graft.stats.auto" -> "true"))
    DeltaLite.append(spark, path,
      (750L until 800L).map(i => (i, Some(s"x$i"))).toDF("k", "tag"))
    val v2 = DeltaLite.parseColStatsFull(DeltaLite.snapshot(path).properties)
    assert(v2._1 === 1050L)
    assert(v2._2("k").ndv.exists(n => n > 740 && n < 860),
      s"auto-append must extend ndv to ~800, got ${v2._2("k").ndv}")
    // min/max stay LIVE from file stats either way: CBO sees the new max
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      val st = DeltaLite.read(ss, path).queryExecution.optimizedPlan.stats
      val k = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "k" => cs }.get
      assert(k.max.contains(799L), s"live max must be current: $k")
      assert(k.distinctCount.exists(n => n.toLong > 740),
        s"merged ndv must surface in the plan: $k")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    // a table WITHOUT standing stats: analyzeAppend is a no-op
    val bare = java.nio.file.Files.createTempDirectory("graft_incbare")
      .toString + "/t"
    DeltaLite.create(spark, bare, Seq((1L, "a")).toDF("k", "tag"))
    assert(DeltaLite.analyzeAppend(spark, bare,
      Seq((2L, "b")).toDF("k", "tag")) === -1L)
    // stats maintenance is BEST-EFFORT: a garbled stats property never
    // fails reads or (auto) appends — the data still lands
    DeltaLite.setProperties(path,
      Map(DeltaLite.ColStatsKey -> "{definitely not json"))
    val before = DeltaLite.read(spark, path).count()
    DeltaLite.append(spark, path,
      (800L until 810L).map(i => (i, Some(s"y$i"))).toDF("k", "tag"))
    assert(DeltaLite.read(spark, path).count() === before + 10)
    val bad = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS FOR COLUMNS (nope)")
        .collect()
    }
    assert(bad.getMessage.contains("nope"))
  }

  test("ANALYZE WITH HISTOGRAM: skew-aware selectivity replaces the uniform [min,max] guess") {
    val path = java.nio.file.Files.createTempDirectory("graft_hist")
      .toString + "/t"
    // HARD skew: 99% of values in [0, 100), 1% spread to ~10M — the
    // uniform assumption prices v > 5M at ~50%, reality is ~1%
    DeltaLite.create(spark, path, spark.range(100000L).select(
      when(col("id") < 99000L, col("id") % 100L)
        .otherwise(col("id") * 100L).as("v"),
      col("id").as("k")).repartition(2))
    // ids 99000..99999 → v = id*100 > 5M: exactly 1000 true rows
    spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS " +
      "FOR COLUMNS (v) WITH HISTOGRAM").collect()
    val entry = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)("v")
    val (height, bins) = entry.hist.get
    assert(bins.size === 32)
    assert(math.abs(height - 100000.0 / 32) < 1.0)
    // nearly all equi-height bins sit inside the dense [0,100) head
    assert(bins.count(_._2 <= 100.0) >= 28,
      s"equi-height bins must crowd the skew head: $bins")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      def est(): BigInt = DeltaLite.read(ss, path)
        .filter(col("v") > 5000000L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      val withHist = est()
      assert(withHist < BigInt(10000),
        s"histogram must price the sparse tail, got $withHist (true 1000)")
      // re-ANALYZE WITHOUT histogram: back to the uniform [min,max] guess
      DeltaLite.analyzeTable(ss, path, Seq("v"))
      val uniform = est()
      assert(uniform > BigInt(30000),
        s"without bins the uniform guess must stay coarse, got $uniform")
      assert(withHist < uniform / 3,
        s"histogram estimate ($withHist) must beat uniform ($uniform)")
      // estimation only: the actual count is unchanged
      assert(DeltaLite.read(ss, path).filter(col("v") > 5000000L).count()
        === 1000L)
      // DATE columns histogram in epoch-day space — the axis estimation
      // converts date literals to (a wrong axis would misprice SILENTLY)
      val dpath = java.nio.file.Files.createTempDirectory("graft_histd")
        .toString + "/t"
      DeltaLite.create(ss, dpath, spark.range(100000L).select(
        date_add(org.apache.spark.sql.functions.to_date(lit("2020-01-01")),
          when(col("id") < 99000L, (col("id") % 100L).cast("int"))
            .otherwise(lit(3650))).as("d"),
        col("id").as("k")).repartition(2))
      DeltaLite.analyzeTable(ss, dpath, Seq("d"), histogramBins = 32)
      val dEst = DeltaLite.read(ss, dpath)
        .filter(col("d") > org.apache.spark.sql.functions.to_date(lit("2025-01-01")))
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(dEst < BigInt(10000),
        s"date bins must price the sparse 2030 tail, got $dEst (true 1000)")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("mergeable histograms: appends fold the quantile digest and reads REBIN — the CBO never prices a drifted distribution against stale bins") {
    val path = java.nio.file.Files.createTempDirectory("graft_histm")
      .toString + "/t"
    // v0: 100k rows valued in [0, 1000)
    DeltaLite.create(spark, path, spark.range(100000L).select(
      (col("id") % 1000L).as("v"), col("id").as("k")).repartition(2),
      properties = Map("graft.stats.auto" -> "true"))
    spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS " +
      "FOR COLUMNS (v) WITH HISTOGRAM").collect()
    val e0 = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)("v")
    assert(e0.qsk.isDefined, "WITH HISTOGRAM must keep the quantile digest")
    assert(e0.histAsOf === Some(100000L))
    // DISTRIBUTION SHIFT: append 100k rows in the DISJOINT range
    // [100000, 101000) — the auto-stats fold merges the batch's digest
    // but the stored bins (all under 1000) are now one epoch behind
    DeltaLite.append(spark, path, spark.range(100000L).select(
      (col("id") % 1000L + 100000L).as("v"),
      (col("id") + 100000L).as("k")).repartition(2))
    val e1 = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)("v")
    assert(e1.qsk.isDefined && e1.hist.isDefined)
    assert(e1.histAsOf === Some(100000L),
      "the as-of stamp records the bins' build, not the fold")
    assert(e1.qsk.get !== e0.qsk.get, "the fold must merge the digest")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
      def est(): BigInt = DeltaLite.read(ss, path)
        .filter(col("v") > 50000L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      // HALF the table (the whole appended batch) sits above 50000.
      // The stale bins top out below 1000 and would price this ~0;
      // the rebinned frame from the merged digest prices ~100k.
      val rebinned = est()
      assert(rebinned > BigInt(60000),
        s"estimate must see the appended range via the merged digest, " +
          s"got $rebinned (true 100000)")
      assert(rebinned <= BigInt(200000), s"bounded by the table, got $rebinned")
      assert(DeltaLite.read(ss, path).filter(col("v") > 50000L).count()
        === 100000L, "estimation only — results unchanged")
      // a SECOND fold keeps maintaining the same digest chain
      DeltaLite.append(ss, path, spark.range(50000L).select(
        (col("id") % 1000L + 200000L).as("v"),
        (col("id") + 300000L).as("k")).repartition(2))
      val again = DeltaLite.read(ss, path).filter(col("v") > 150000L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(again > BigInt(25000),
        s"second fold must extend the frame to the 200k range, got $again " +
          "(true 50000)")
      // DIGEST-LESS histogram (pre-digest stats / garbled property):
      // the read path must DISARM — serve no histogram rather than
      // price against bins it cannot rebin. Strip qsk and the asof
      // stamp stays ≠ maintained count, so rebin is demanded but
      // impossible → the estimate falls back to uniform [min,max].
      val props = DeltaLite.snapshot(path).properties
      val stripped = props(DeltaLite.ColStatsKey)
        .replaceAll("\"qsk\":\"[^\"]*\",?", "")
      DeltaLite.setProperties(path, Map(DeltaLite.ColStatsKey -> stripped))
      val e2 = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)("v")
      assert(e2.qsk.isEmpty && e2.hist.isDefined,
        "precondition: bins present, digest gone")
      val disarmed = DeltaLite.read(ss, path).filter(col("v") > 150000L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      // uniform over live [0, 200999] prices v > 150000 at ~25% of 250k
      assert(disarmed > BigInt(25000),
        s"disarmed estimate must fall back to uniform, not stale-bin ~0: " +
          s"got $disarmed")
      // and a fold over a digest-less entry DROPS the unmaintainable
      // histogram outright (disarm at fold time)
      DeltaLite.append(ss, path, spark.range(10L).select(
        col("id").as("v"), (col("id") + 999999L).as("k")))
      val e3 = DeltaLite.parseColStats(DeltaLite.snapshot(path).properties)("v")
      assert(e3.hist.isEmpty && e3.qsk.isEmpty,
        "fold without a digest must drop the stale bins")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("maintenance SQL: DESCRIBE HISTORY/DETAIL, OPTIMIZE, VACUUM via spark.sql") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sqlmaint").toString
    DeltaLite.create(spark, path,
      (0L until 40L).map(i => (i, s"p${i % 2}", i * 1.0))
        .toDF("k", "part", "v").coalesce(1), partitionBy = Seq("part"))
    (0 until 3).foreach { b =>
      DeltaLite.append(spark, path,
        (100L + b * 10 until 110L + b * 10).map(i => (i, "p0", i * 1.0))
          .toDF("k", "part", "v").coalesce(1))
    }
    // DESCRIBE HISTORY (with LIMIT)
    val h = spark.sql(s"DESCRIBE HISTORY '$path'").collect()
    assert(h.length === 4 && h.head.getString(1) === "APPEND")
    assert(spark.sql(s"DESCRIBE HISTORY '$path' LIMIT 2").count() === 2)
    // DESCRIBE DETAIL
    val det = spark.sql(s"DESCRIBE DETAIL '$path'").collect()(0)
    assert(det.getAs[Long]("num_rows") === 70L)
    assert(det.getAs[String]("partition_columns") === "part")
    // OPTIMIZE WHERE packs only p0's files
    val p1Files = DeltaLite.snapshot(path).files
      .filter(_.pv("part") == "p1").map(_.path).toSet
    spark.sql(s"OPTIMIZE '$path' WHERE part = 'p0'").collect()
    val after = DeltaLite.snapshot(path)
    assert(after.files.count(_.pv("part") == "p0") === 1)
    assert(after.files.filter(_.pv("part") == "p1").map(_.path).toSet === p1Files)
    // RESTORE back to the pre-OPTIMIZE file layout (files still on disk)
    val preOpt = spark.sql(s"DESCRIBE HISTORY '$path'").collect()
      .map(_.getLong(0)).max - 1
    spark.sql(s"RESTORE '$path' TO VERSION AS OF $preOpt")
    assert(DeltaLite.read(spark, path).count() === 70)
    assert(DeltaLite.snapshot(path).files.count(_.pv("part") == "p0") === 4)
    // CLONE: zero-copy fork readable immediately
    val dst = java.nio.file.Files.createTempDirectory("graft_sqlclone").toString + "/t"
    spark.sql(s"CLONE '$path' TO '$dst'")
    assert(DeltaLite.read(spark, dst).count() === 70)
    // CLONE ... DEEP: materialized fork, owns every file
    val dstDeep = java.nio.file.Files.createTempDirectory("graft_sqldeep").toString + "/t"
    spark.sql(s"CLONE '$path' TO '$dstDeep' DEEP")
    assert(DeltaLite.read(spark, dstDeep).count() === 70)
    assert(DeltaLite.snapshot(dstDeep).files.forall(f =>
      !java.nio.file.Paths.get(f.path).isAbsolute))
    // VACUUM DRY RUN counts the now-unreferenced OPTIMIZE pack; VACUUM
    // deletes it and the live set still reads
    val dry = spark.sql(s"VACUUM '$path' DRY RUN").collect()(0).getInt(0)
    assert(dry > 0)
    assert(spark.sql(s"VACUUM '$path'").collect()(0).getInt(0) === dry)
    assert(DeltaLite.read(spark, path).count() === 70)
    // CONVERT TO DELTA adopts a plain parquet dir in place
    val plain = java.nio.file.Files.createTempDirectory("graft_sqlconv").toString
    (0L until 20L).map(i => (i, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(plain)
    spark.sql(s"CONVERT TO DELTA '$plain'")
    assert(DeltaLite.read(spark, plain).count() === 20)
    // REORG APPLY (PURGE) materializes a DV'd soft delete
    DeltaLite.deleteVectorized(spark, plain, $"k" < 5L)
    spark.sql(s"REORG '$plain' APPLY (PURGE)")
    val reorged = DeltaLite.snapshot(plain)
    assert(reorged.files.forall(_.dv.isEmpty))
    assert(DeltaLite.read(spark, plain).count() === 15)
    // ALTER RENAME/DROP COLUMN: metadata-only column mapping
    spark.sql(s"ALTER '$plain' RENAME COLUMN v TO w")
    assert(DeltaLite.read(spark, plain).columns.toSeq === Seq("k", "w"))
    spark.sql(s"ALTER '$plain' DROP COLUMN w")
    assert(DeltaLite.read(spark, plain).columns.toSeq === Seq("k"))
    // ADD/DROP CONSTRAINT via SQL: writes gate on the predicate
    spark.sql(s"ALTER '$plain' ADD CONSTRAINT k_nonneg CHECK (k >= 0)")
    intercept[IllegalArgumentException] {
      DeltaLite.append(spark, plain, Seq(-1L).toDF("k"))
    }
    spark.sql(s"ALTER '$plain' DROP CONSTRAINT k_nonneg")
    DeltaLite.append(spark, plain, Seq(-1L).toDF("k"))
    DeltaLite.delete(spark, plain, $"k" === -1L)
    // ALTER COLUMN SET/DROP DEFAULT via SQL (write-time fill itself is
    // covered by ScaleSpec): the default lands namespaced and drops clean
    spark.sql(s"ALTER '$plain' ALTER COLUMN k SET DEFAULT 777")
    assert(DeltaLite.columnDefaults(DeltaLite.snapshot(plain).properties)
      === Map("k" -> "777"))
    spark.sql(s"ALTER '$plain' ALTER COLUMN k DROP DEFAULT")
    assert(DeltaLite.columnDefaults(
      DeltaLite.snapshot(plain).properties).isEmpty)
    // SET/UNSET TBLPROPERTIES: appendOnly locks, unset re-opens
    spark.sql(s"ALTER '$plain' SET TBLPROPERTIES ('delta.appendOnly' = 'true', 'team' = 'ingest')")
    assert(spark.sql(s"DESCRIBE DETAIL '$plain'").collect()(0)
      .getAs[String]("properties").contains("team=ingest"))
    intercept[UnsupportedOperationException] {
      DeltaLite.delete(spark, plain, $"k" === 5L)
    }
    spark.sql(s"ALTER '$plain' UNSET TBLPROPERTIES ('delta.appendOnly')")
    DeltaLite.delete(spark, plain, $"k" === 5L)
    assert(DeltaLite.read(spark, plain).count() === 14)
    // COPY INTO via SQL: first load reports the file count, re-run 0
    val landing = java.nio.file.Files.createTempDirectory("graft_sqlcopy").toString
    (100L until 110L).map(i => (i, i * 1.0)).toDF("k", "w")
      .coalesce(1).write.mode("overwrite").parquet(landing)
    val tgt = java.nio.file.Files.createTempDirectory("graft_sqlcopyt").toString + "/t"
    DeltaLite.create(spark, tgt, Seq.empty[(Long, Double)].toDF("k", "w"))
    assert(spark.sql(s"COPY INTO '$tgt' FROM '$landing'").collect()(0)
      .getAs[Long]("num_files_loaded") === 1L)
    assert(spark.sql(s"COPY INTO '$tgt' FROM '$landing'").collect()(0)
      .getAs[Long]("num_files_loaded") === 0L)
    assert(DeltaLite.read(spark, tgt).count() === 10)
    // non-graft SQL still parses through the delegate untouched
    assert(spark.sql("SELECT 1 + 1 AS two").collect()(0).getInt(0) === 2)
  }

  test("SQL DML: DELETE / UPDATE / INSERT INTO / MERGE INTO on DeltaLite paths") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_sqldml").toString
    DeltaLite.create(spark, p,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "s", "v").coalesce(1))
    // INSERT INTO appends the subquery's rows
    spark.sql(s"INSERT INTO '$p' SELECT 4 AS k, 'd' AS s, 40 AS v")
    assert(DeltaLite.read(spark, p).count() === 4)
    // UPDATE with a nested-function SET list (top-level comma split)
    spark.sql(
      s"UPDATE '$p' SET v = v + least(1, 2), s = upper(s) WHERE k <= 2")
    val afterUpdate = DeltaLite.read(spark, p).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(afterUpdate === Seq((1L, "A", 11L), (2L, "B", 21L),
      (3L, "c", 30L), (4L, "d", 40L)))
    // DELETE
    spark.sql(s"DELETE FROM '$p' WHERE k = 3")
    assert(DeltaLite.read(spark, p).orderBy("k").select("k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 4L))
    // star-clause MERGE: update-all matched, insert-all new
    spark.sql(
      s"""MERGE INTO '$p' USING (
            SELECT 4 AS k, 'dd' AS s, 44 AS v
            UNION ALL SELECT 5 AS k, 'e' AS s, 50 AS v) ON (k)
          WHEN MATCHED THEN UPDATE ALL
          WHEN NOT MATCHED THEN INSERT ALL""")
    val merged = DeltaLite.read(spark, p).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(merged === Seq((1L, "A", 11L), (2L, "B", 21L),
      (4L, "dd", 44L), (5L, "e", 50L)))
    // WHEN NOT MATCHED BY SOURCE THEN DELETE shrinks to the source's keys
    spark.sql(
      s"""MERGE INTO '$p' USING (SELECT 5 AS k, 'e2' AS s, 51 AS v) ON (k)
          WHEN MATCHED THEN UPDATE ALL
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(DeltaLite.read(spark, p).collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))) === Seq((5L, "e2", 51L)))
    // catalog-table DML still delegates to Spark's parser: the unquoted
    // ref resolves (and fails) as a CATALOG table, not a graft path
    val err = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("DELETE FROM missing_catalog_tbl WHERE x = 1"))
    assert(err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }

  test("multimodal: audio window geometry and exact stub energies") {
    import spark.implicits._
    implicit val s = spark
    // 10 bytes of known values; frame 4, hop 2 → windows at 0,2,4,6,8
    val bytes = Array[Byte](0, 10, 20, 30, 40, 50, 60, 70, 80, 90)
    val media = Seq((1L, bytes)).toDF("id", "media")
    val w = graft.functions.Multimodal.windowAudio(media, frameBytes = 4, hopBytes = 2)
      .orderBy(col("win_idx"))
      .as[(Long, Int, Int, Double)].collect()
    assert(w.map(_._2).toSeq === Seq(0, 1, 2, 3, 4))
    assert(w.map(_._3).toSeq === Seq(4, 4, 4, 4, 2), "last window truncates")
    // energy = mean byte value per window: off=2 covers bytes 20..50 etc.
    assert(w.map(_._4).toSeq === Seq(15.0, 35.0, 55.0, 75.0, 85.0))
    // empty payload → no windows
    assert(graft.functions.Multimodal.windowAudio(
      Seq((2L, Array.empty[Byte])).toDF("id", "media"), 4, 2).count() === 0)
  }

  test("join MV: delta propagation equals full recompute; replay no-op; append-only enforced") {
    import spark.implicits._
    import graft.operators.IncrementalMv
    val a = Files.createTempDirectory("graft_test_mvj_a").toString
    val b = Files.createTempDirectory("graft_test_mvj_b").toString
    val mv = Files.createTempDirectory("graft_test_mvj_t").toString + "/mv"
    DeltaLite.create(spark, a,
      Seq((1L, 10L, 5.0), (2L, 20L, 7.0)).toDF("fk", "cust", "v"))
    DeltaLite.create(spark, b,
      Seq((10L, "x")).toDF("ck", "seg")) // cust 20 is late-arriving
    def refresh(): Long = IncrementalMv.refreshJoinAppendOnly(spark, a, b, mv,
      "cust", "ck", Seq("fk", "cust", "v"), Seq("ck", "seg"))
    refresh()
    assert(DeltaLite.read(spark, mv).count() === 1) // only cust 10 joins yet

    // leg 1: new facts join the current dim
    DeltaLite.append(spark, a, Seq((3L, 10L, 9.0)).toDF("fk", "cust", "v"))
    refresh()
    // leg 2: the late dim row surfaces the OLD fact for cust 20
    DeltaLite.append(spark, b, Seq((20L, "y")).toDF("ck", "seg"))
    val v = refresh()
    val got = DeltaLite.read(spark, mv).orderBy("fk")
      .as[(Long, Long, Double, Long, String)].collect().toSeq
    assert(got === Seq((1L, 10L, 5.0, 10L, "x"), (2L, 20L, 7.0, 20L, "y"),
      (3L, 10L, 9.0, 10L, "x")),
      "incremental join view must equal the full A JOIN B recompute")

    // replayed refresh (nothing advanced) is a no-op at the same version
    assert(refresh() === v)

    // a delete in a source breaks the append-only contract LOUDLY
    DeltaLite.delete(spark, a, col("fk") === 1L)
    val e = intercept[IllegalArgumentException](refresh())
    assert(e.getMessage.contains("append-only"))
  }

  test("MV auto-rewrite: aggregates over the source transparently re-aggregate the MV") {
    import graft.plans.MvRewrite
    val dir = Files.createTempDirectory("graft_mvrw").toString
    val src = s"$dir/fact"
    val mvp = s"$dir/mv"
    // NULLs planted in the measure: AVG's denominator is the NON-NULL
    // count, so a rewrite dividing by COUNT(*) would be visibly wrong —
    // the MV carries COUNT(value) (nnMap) to derive AVG correctly
    val fact = Pipeline.silverEvents(spark, sf)
      .select(col("ts_sec").cast("date").as("day"), col("event_type"),
        when(col("event_id") % 10 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value"))
    DeltaLite.create(spark, src, fact)
    val base = DeltaLite.read(spark, src)
    DeltaLite.create(spark, mvp, base
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("c"),
        count(col("value")).as("cn"),
        min(col("value")).as("mn"), max(col("value")).as("mx")))
    try {
      MvRewrite.register(spark, MvRewrite.MvDef(
        sourcePath = src, mvPath = mvp,
        keyMap = Map("day" -> "day", "event_type" -> "event_type"),
        sumMap = Map("value" -> "s"), cntCol = "c",
        minMap = Map("value" -> "mn"), maxMap = Map("value" -> "mx"),
        nnMap = Map("value" -> "cn")))
      def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toUri.getPath)
              case _ => Seq.empty[String]
            }
        }.flatten
      val q = DeltaLite.read(spark, src)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          avg(col("value")).as("av"), max(col("value")).as("mxv"))
      val roots = scanRoots(q)
      assert(roots.nonEmpty && roots.forall(_.startsWith(mvp)),
        s"the aggregate must redirect onto the MV scan, got $roots")
      // the substitution surfaces in the shared decision log (the
      // EXPLAIN PRUNING surface) — silent rewrites must be askable
      val mvDs = graft.plans.DynamicBranchPruning.decisions(q.queryExecution)
      assert(mvDs.exists(_._2.contains(
        "MvRewrite: served from materialized view")),
        s"the MV rewrite must be recorded: $mvDs")
      // rewritten results equal the un-rewritten computation exactly
      // (sum re-association over doubles: compare at 1e-9 tolerance)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val direct = DeltaLite.read(spark, src).groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          avg(col("value")).as("av"), max(col("value")).as("mxv"))
        .collect().map(r => r.getDate(0).toString ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      spark.conf.set("spark.graft.mv.autoRewrite", "true")
      val got = q.collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      assert(got.keySet === direct.keySet)
      got.foreach { case (k, (n, sv, av, mxv)) =>
        val (dn, dsv, dav, dmxv) = direct(k)
        assert(n === dn, s"count differs for $k")
        assert(math.abs(sv - dsv) < 1e-9 && math.abs(av - dav) < 1e-9,
          s"sum/avg differ for $k")
        assert(mxv === dmxv, s"max differs for $k")
      }
      // a non-derivable aggregate (count distinct) must NOT rewrite
      val nd = scanRoots(DeltaLite.read(spark, src).groupBy(col("day"))
        .agg(countDistinct(col("event_type")).as("nt")))
      assert(nd.nonEmpty && nd.forall(_.startsWith(src)),
        s"count-distinct cannot derive from the MV, got $nd")
      // AVG over a NULLABLE measure with no registered non-null count
      // must DECLINE (COUNT(*) is the wrong denominator when the
      // measure holds NULLs) — re-register without nnMap and check the
      // aggregate stays on the source scan
      MvRewrite.register(spark, MvRewrite.MvDef(
        sourcePath = src, mvPath = mvp,
        keyMap = Map("day" -> "day", "event_type" -> "event_type"),
        sumMap = Map("value" -> "s"), cntCol = "c",
        minMap = Map("value" -> "mn"), maxMap = Map("value" -> "mx")))
      val avgDecline = scanRoots(DeltaLite.read(spark, src)
        .groupBy(col("day")).agg(avg(col("value")).as("av")))
      assert(avgDecline.nonEmpty && avgDecline.forall(_.startsWith(src)),
        s"nullable-measure AVG without nnMap must stay on the source, got $avgDecline")
      // restore the full registration for the remaining asserts
      MvRewrite.register(spark, MvRewrite.MvDef(
        sourcePath = src, mvPath = mvp,
        keyMap = Map("day" -> "day", "event_type" -> "event_type"),
        sumMap = Map("value" -> "s"), cntCol = "c",
        minMap = Map("value" -> "mn"), maxMap = Map("value" -> "mx"),
        nnMap = Map("value" -> "cn")))
      // a KEY-column filter selects whole groups — it replays over the
      // MV and the rewrite still fires, matching the direct answer
      val kf = DeltaLite.read(spark, src)
        .filter(col("event_type") === "click")
        .groupBy(col("day")).agg(sum(col("value")).as("sv"))
      val kfr = scanRoots(kf)
      assert(kfr.nonEmpty && kfr.forall(_.startsWith(mvp)),
        s"a key-only filter must replay over the MV, got $kfr")
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val kfDirect = DeltaLite.read(spark, src)
        .filter(col("event_type") === "click")
        .groupBy(col("day")).agg(sum(col("value")).as("sv"))
        .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
      spark.conf.set("spark.graft.mv.autoRewrite", "true")
      val kfGot = kf.collect()
        .map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
      assert(kfGot.keySet === kfDirect.keySet)
      kfGot.foreach { case (k, v) =>
        assert(math.abs(v - kfDirect(k)) < 1e-9, s"filtered sum differs: $k") }
      // a MEASURE-column filter must NOT rewrite (per-row, not
      // per-group, selection — the MV cannot answer it)
      val fp = scanRoots(DeltaLite.read(spark, src)
        .filter(col("value") > 10.0)
        .groupBy(col("day")).agg(sum(col("value")).as("sv")))
      assert(fp.nonEmpty && fp.forall(_.startsWith(src)),
        s"a measure-filtered aggregate must fall through, got $fp")
      // FRESHNESS GUARD: a source commit past the registered version
      // disarms the rewrite — the stale MV must never answer, and the
      // refresh query itself (an aggregate over the source!) must not
      // feed the old MV back into itself
      val v0 = q.collect().map(_.getLong(1)).sum
      DeltaLite.append(spark, src, fact.limit(5))
      val stale = scanRoots(DeltaLite.read(spark, src).groupBy(col("day"))
        .agg(count(lit(1)).as("n")))
      assert(stale.nonEmpty && stale.forall(_.startsWith(src)),
        s"a stale MV must disarm the rewrite, got $stale")
      DeltaLite.replaceWhere(spark, mvp, lit(true),
        DeltaLite.read(spark, src)
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("value")).as("s"), count(lit(1)).as("c"),
            min(col("value")).as("mn"), max(col("value")).as("mx")))
      // refresh re-arms by re-registration (stamps the new version)
      MvRewrite.register(spark, MvRewrite.MvDef(
        sourcePath = src, mvPath = mvp,
        keyMap = Map("day" -> "day", "event_type" -> "event_type"),
        sumMap = Map("value" -> "s"), cntCol = "c",
        minMap = Map("value" -> "mn"), maxMap = Map("value" -> "mx")))
      val q2 = DeltaLite.read(spark, src).groupBy(col("day"))
        .agg(count(lit(1)).as("n"))
      val r2 = scanRoots(q2)
      assert(r2.nonEmpty && r2.forall(_.startsWith(mvp)),
        s"re-registration must re-arm the rewrite, got $r2")
      val v1 = q2.collect().map(_.getLong(1)).sum
      assert(v1 === v0 + 5,
        "the re-armed rewrite must serve the refreshed MV")
      // HAVING composes for free: the Filter sits ABOVE the Aggregate,
      // so transformUp rewrites the aggregate beneath it untouched
      val hv = DeltaLite.read(spark, src).groupBy(col("day"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 5)
      val hr = scanRoots(hv)
      assert(hr.nonEmpty && hr.forall(_.startsWith(mvp)),
        s"HAVING over a rewritable aggregate must still hit the MV: $hr")
    } finally {
      MvRewrite.deregister(src)
      spark.conf.set("spark.graft.mv.autoRewrite", "true")
    }
  }

  test("metadata-only aggregates: global COUNT/MIN/MAX answer from log stats, no scan") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_statsagg").toString + "/t"
    DeltaLite.create(spark, p, Seq(
      (1L, 10.5, "alpha", new java.sql.Timestamp(1704067200000L)),
      (2L, -3.25, "zeta", new java.sql.Timestamp(1704070800000L)))
      .toDF("k", "v", "s", "ts").repartition(2))
    DeltaLite.append(spark, p, Seq(
      (3L, 99.0, "beta", new java.sql.Timestamp(1704153600000L)))
      .toDF("k", "v", "s", "ts").coalesce(1))
    def hasRelation(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          true
      }.nonEmpty
    val q = DeltaLite.read(spark, p).agg(
      count(lit(1)).as("n"), min(col("k")).as("mnk"),
      max(col("v")).as("mxv"), min(col("s")).as("mns"),
      max(col("ts")).as("mxts"))
    assert(!hasRelation(q), "the scan must collapse to a LocalRelation:\n" +
      q.queryExecution.optimizedPlan)
    // the substitution surfaces in the shared decision log (the
    // EXPLAIN PRUNING surface)
    val saDs = graft.plans.DynamicBranchPruning.decisions(q.queryExecution)
    assert(saDs.exists(_._2.contains("StatsAggRewrite: answered from")),
      s"the stats-only answer must be recorded: $saDs")
    val row = q.collect()(0)
    assert(row.getLong(0) === 3L && row.getLong(1) === 1L &&
      row.getDouble(2) === 99.0 && row.getString(3) === "alpha")
    assert(row.getTimestamp(4) === new java.sql.Timestamp(1704153600000L))
    // cross-check against the real scan
    spark.conf.set("spark.graft.statsAgg", "false")
    val direct = DeltaLite.read(spark, p).agg(
      count(lit(1)), min(col("k")), max(col("v")), min(col("s")),
      max(col("ts"))).collect()(0)
    spark.conf.set("spark.graft.statsAgg", "true")
    assert(row.toSeq === direct.toSeq)
    // declines: COUNT(col) has non-null semantics stats can't prove
    assert(hasRelation(DeltaLite.read(spark, p).agg(count(col("v")))))
    // declines: grouped aggregate
    assert(hasRelation(DeltaLite.read(spark, p)
      .groupBy(col("s")).agg(count(lit(1)))))
    // declines: filter above the scan
    assert(hasRelation(DeltaLite.read(spark, p)
      .filter(col("k") > 1L).agg(count(lit(1)))))
    // declines: avg is not derivable from min/max/rows
    assert(hasRelation(DeltaLite.read(spark, p).agg(avg(col("v")))))
    // declines on a TIME-TRAVEL scan once the referenced files left the
    // live set: v0's files don't resolve in the current snapshot after
    // the overwrite, so the rule falls through — and the answer is the
    // historical truth via the real scan
    DeltaLite.replaceWhere(spark, p, lit(true),
      Seq((9L, 1.0, "only", new java.sql.Timestamp(0L)))
        .toDF("k", "v", "s", "ts").coalesce(1))
    val tt = DeltaLite.read(spark, p, asOf = Some(0L))
      .agg(count(lit(1)).as("n"))
    assert(hasRelation(tt),
      "a time-travel scan of rewritten files must not answer from " +
        "current-snapshot stats")
    assert(tt.collect()(0).getLong(0) === 2L)
    // the CURRENT head still collapses
    assert(!hasRelation(DeltaLite.read(spark, p).agg(count(lit(1)))))
    // declines after a DV delete: physical rows over-count and the
    // extremum may be deleted — and the answer stays CORRECT via scan
    DeltaLite.deleteVectorized(spark, p, col("k") === 9L)
    val afterDv = DeltaLite.read(spark, p)
      .agg(count(lit(1)).as("n"), max(col("v")).as("mxv")).collect()(0)
    assert(afterDv.getLong(0) === 0L && afterDv.isNullAt(1))
  }

  test("metadata-only aggregates: partition-key GROUP BY answers per-partition from the log") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_pstats").toString + "/t"
    // two partition columns × multi-commit → multi-file branches AND
    // mergeable subset groups
    DeltaLite.create(spark, p, Seq(
      (1L, 10L, "a", "x"), (2L, 20L, "a", "y"),
      (3L, 30L, "b", "x"), (4L, 40L, "b", "x"))
      .toDF("k", "cents", "p1", "p2"),
      partitionBy = Seq("p1", "p2"))
    DeltaLite.append(spark, p, Seq((5L, 5L, "a", "x"), (6L, 60L, "b", "y"))
      .toDF("k", "cents", "p1", "p2"))
    def hasRelation(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          true
      }.nonEmpty
    // full partition-key grouping: one group per live (p1, p2)
    val q = DeltaLite.read(spark, p).groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("mn"),
        max(col("cents")).as("mx"))
    assert(!hasRelation(q), "partition-key GROUP BY must collapse:\n" +
      q.queryExecution.optimizedPlan)
    // SUBSET grouping merges branches: p1 alone combines (a,x)+(a,y)
    val sub = DeltaLite.read(spark, p).groupBy(col("p1"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("mn"),
        max(col("cents")).as("mx"), max(col("k")).as("mxk"))
    assert(!hasRelation(sub), "subset grouping must collapse:\n" +
      sub.queryExecution.optimizedPlan)
    // values match the real scan exactly (both shapes)
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val gotQ = sorted(q); val gotSub = sorted(sub)
    spark.conf.set("spark.graft.statsAgg", "false")
    assert(gotQ === sorted(DeltaLite.read(spark, p)
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("mn"),
        max(col("cents")).as("mx"))))
    assert(gotSub === sorted(DeltaLite.read(spark, p).groupBy(col("p1"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("mn"),
        max(col("cents")).as("mx"), max(col("k")).as("mxk"))))
    spark.conf.set("spark.graft.statsAgg", "true")
    // declines: grouping on a DATA column (not a partition literal)
    assert(hasRelation(DeltaLite.read(spark, p).groupBy(col("cents"))
      .agg(count(lit(1)))))
    // declines: a measure stats can't answer (sum)
    assert(hasRelation(DeltaLite.read(spark, p).groupBy(col("p1"))
      .agg(sum(col("cents")))))
    // declines: a measure that is itself a partition literal (no
    // cross-branch literal ordering)
    assert(hasRelation(DeltaLite.read(spark, p).groupBy(col("p1"))
      .agg(max(col("p2")))))
    // a DELETEd partition's group disappears (branches follow the log)
    DeltaLite.delete(spark, p, col("p1") === "b" && col("p2") === "y")
    val after = DeltaLite.read(spark, p).groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n"))
    assert(!hasRelation(after))
    assert(sorted(after).size === 3)
  }

  test("symlink manifest: per-partition layout, staleness wipe, DV refusal") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_manifest").toString + "/t"
    DeltaLite.create(spark, p,
      Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
        .toDF("k", "s", "part").repartition(2, col("part")),
      partitionBy = Seq("part"))
    val m1 = DeltaLite.generateSymlinkManifest(spark, p)
    // Hive layout: one manifest per live partition
    assert(m1.size === 2 &&
      m1.exists(_.contains("part=p1")) && m1.exists(_.contains("part=p2")))
    // the manifest-following reader sees exactly the table
    val viaManifest = m1.flatMap(m => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(m)),
      "UTF-8").split("\n")).filter(_.nonEmpty)
    assert(spark.read.parquet(viaManifest: _*).count() === 3)
    // dropping a partition then re-generating wipes its stale manifest
    DeltaLite.delete(spark, p, col("part") === "p2")
    val m2 = DeltaLite.generateSymlinkManifest(spark, p)
    assert(m2.size === 1 && m2.head.contains("part=p1"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      p, "_symlink_format_manifest", "part=p2")),
      "a dropped partition's manifest dir must be wiped")
    // DV tables refuse: a symlink reader would resurrect deleted rows
    DeltaLite.deleteVectorized(spark, p, col("k") === 1L)
    val e = intercept[IllegalArgumentException](
      DeltaLite.generateSymlinkManifest(spark, p))
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("dbt exposures land in manifest.json with reverse lineage in child_map") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_expo").toString
    Pipeline.runAll(spark, sf, target)
    val m = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target, "manifest.json")), "UTF-8"))
    val expo = (m \ "exposures").asInstanceOf[JObject].obj.toMap
    assert(expo.contains("exposure.graft.revenue_dashboard"))
    val rd = expo("exposure.graft.revenue_dashboard")
    assert((rd \ "type").asInstanceOf[JString].s === "dashboard")
    assert((rd \ "depends_on" \ "nodes").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JString].s) ===
      List("model.graft.gold_daily_revenue"))
    // impact analysis: the model's child_map includes the exposure —
    // "what breaks if I change gold_daily_revenue" now crosses the
    // warehouse edge
    val cm = (m \ "child_map" \ "model.graft.gold_daily_revenue")
      .asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
    assert(cm.contains("exposure.graft.revenue_dashboard"))
  }

  test("Observation API: DQ metrics ride the write action itself — no second scan") {
    // dbt-style test metrics usually cost a second pass over the model;
    // Spark's Observation collects them ON the materializing action
    // (accumulator-backed, exact for deterministic plans). At 100 TB
    // this is the difference between auditing a load and re-reading it:
    // row count, null census, and freshness bounds arrive with the job.
    import org.apache.spark.sql.Observation
    val obs = Observation("silver_dq")
    val silver = Pipeline.silverEvents(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("null_values"),
        sum((col("value") < 0).cast("long")).as("negative_values"),
        max(col("ts_sec")).as("max_loaded_at"))
    val n = silver.count() // ONE action: metrics piggyback on it
    val m = obs.get
    assert(m("n_rows") === n,
      "observed row count must equal the action's own count")
    assert(m("null_values") === 0L,
      "silver filters null values; the in-flight census must agree")
    assert(m("max_loaded_at") != null)
    // the metric values match a (deliberately) second-pass recompute
    val expectNeg = Pipeline.silverEvents(spark, sf)
      .filter(col("value") < 0).count()
    assert(m("negative_values") === expectNeg)
  }

  test("Pipeline model contracts: enforced schema gate + not_null becomes a table constraint") {
    import Pipeline.{Contract, Model}
    val target = Files.createTempDirectory("graft_contract").toString
    val contracted = Model("silver_typed", Nil,
      (s, _) => Pipeline.silverEvents(s, sf)
        .select(col("event_id"), col("event_type"), col("value"),
          col("ts_sec")),
      code = "select event_id, event_type, value, ts_sec from silver",
      contract = Some(Contract(
        columns = Seq("event_id" -> "bigint", "event_type" -> "string",
          "value" -> "double", "ts_sec" -> "timestamp"),
        notNull = Seq("event_id", "event_type"))))
    Pipeline.run(spark, Seq(contracted), target)
    // not_null contract columns persisted as CHECK constraints — EVERY
    // later write path is now gated, not just this run
    val snap = DeltaLite.snapshot(s"$target/silver_typed")
    assert(snap.constraints.keySet ===
      Set("contract_event_id_not_null", "contract_event_type_not_null"))
    import spark.implicits._
    val bad = intercept[IllegalArgumentException](DeltaLite.append(spark,
      s"$target/silver_typed",
      Seq((null.asInstanceOf[java.lang.Long], "click", 1.0,
        new java.sql.Timestamp(0L)))
        .toDF("event_id", "event_type", "value", "ts_sec")))
    assert(bad.getMessage.contains("contract_event_id_not_null"))
    // a type-breaking edit fails BEFORE materializing (no new commit)
    val v0 = DeltaLite.latestVersion(s"$target/silver_typed").get
    val broken = contracted.copy(code = contracted.code + " -- v2",
      build = (s, _) => Pipeline.silverEvents(s, sf)
        .select(col("event_id").cast("int"), col("event_type"),
          col("value"), col("ts_sec")))
    val e1 = intercept[IllegalArgumentException](
      Pipeline.run(spark, Seq(broken), target, selective = true))
    assert(e1.getMessage.contains("CONTRACT_VIOLATION") &&
      e1.getMessage.contains("column=event_id"))
    assert(DeltaLite.latestVersion(s"$target/silver_typed").get === v0,
      "a contract violation must not commit anything")
    // a column-set-breaking edit names the missing/extra columns
    val dropped = contracted.copy(code = contracted.code + " -- v3",
      build = (s, _) => Pipeline.silverEvents(s, sf)
        .select(col("event_id"), col("event_type"), col("value")))
    val e2 = intercept[IllegalArgumentException](
      Pipeline.run(spark, Seq(dropped), target, selective = true))
    assert(e2.getMessage.contains("missing=List(ts_sec)"))
    // declaring not_null on an undeclared column is rejected at Model
    // construction, mirroring dbt's contract/constraint consistency check
    intercept[IllegalArgumentException](Contract(
      columns = Seq("a" -> "bigint"), notNull = Seq("b")))
  }

  test("Pipeline pre/post hooks run around the build with {{ this }} resolved; reused models skip hooks") {
    import Pipeline.Model
    import spark.implicits._
    val target = Files.createTempDirectory("graft_hooks").toString
    val audit = s"$target/audit_log"
    DeltaLite.create(spark, audit,
      Seq(("bootstrap", 0L)).toDF("tag", "n").coalesce(1))
    val hooked = Model("gold_rev", Nil,
      (s, _) => Pipeline.goldDailyRevenue(s, sf),
      code = "select ... revenue",
      preHooks = Seq(
        s"INSERT INTO '$audit' SELECT 'pre_gold_rev' AS tag, 0L AS n"),
      postHooks = Seq(
        // {{ this }} resolves to the model's own target path — the
        // post-hook audits the row count of what was just materialized
        s"INSERT INTO '$audit' SELECT 'post_gold_rev' AS tag, " +
          "count(*) AS n FROM gold_rev"))
    Pipeline.run(spark, Seq(hooked), target, selective = true)
    val rows = DeltaLite.read(spark, audit)
      .as[(String, Long)].collect().toMap
    val built = DeltaLite.read(spark, s"$target/gold_rev").count()
    assert(rows.contains("pre_gold_rev"))
    assert(rows("post_gold_rev") === built,
      "post-hook must see the materialized table via {{ this }}")
    // cache-hit rerun: model is reused → hooks must NOT re-fire
    Pipeline.run(spark, Seq(hooked), target, selective = true)
    assert(DeltaLite.read(spark, audit).count() === 3L,
      "a reused model runs neither pre- nor post-hooks")
  }

  test("dbt docs: catalog.json carries columns, types, row counts and stats-derived min/max") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_catalog").toString
    val order = Pipeline.dag(sf)
    Pipeline.runAll(spark, sf, target)
    val path = Pipeline.generateCatalog(target, order)
    val catalog = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    val nodes = (catalog \ "nodes").asInstanceOf[JObject].obj.toMap
    assert(nodes.keySet === order.map(m => s"model.graft.${m.name}").toSet)
    def asLong(j: JValue): Long = j match {
      case JInt(x) => x.toLong; case JLong(x) => x
      case other => fail(s"not a number: $other")
    }
    // column-level shape: every materialized column appears with its
    // type and ordinal, exactly the mart's schema
    val gold = nodes("model.graft.gold_daily_revenue")
    val snap = DeltaLite.snapshot(s"$target/gold_daily_revenue")
    val cols = (gold \ "columns").asInstanceOf[JObject].obj.toMap
    assert(cols.keySet === snap.schema.fieldNames.toSet)
    snap.schema.fields.zipWithIndex.foreach { case (f, i) =>
      assert((cols(f.name) \ "type") === JString(f.dataType.simpleString))
      assert(asLong(cols(f.name) \ "index") === i.toLong)
    }
    // table stats come from the log, not a scan
    assert(asLong(gold \ "stats" \ "row_count") === snap.totalRows)
    assert(asLong(gold \ "stats" \ "num_files") === snap.files.size.toLong)
    // per-column min/max: the day column's extrema match a direct
    // aggregate over the materialized table (catalog renders dates ISO)
    val ext = DeltaLite.read(spark, s"$target/gold_daily_revenue")
      .agg(min(col("day")).cast("string"), max(col("day")).cast("string"))
      .head()
    assert((cols("day") \ "min") === JString(ext.getString(0)))
    assert((cols("day") \ "max") === JString(ext.getString(1)))
    // n_items (long) extrema render as plain numbers
    val ni = DeltaLite.read(spark, s"$target/gold_daily_revenue")
      .agg(min(col("n_items")), max(col("n_items"))).head()
    assert((cols("n_items") \ "min") === JString(ni.getLong(0).toString))
    assert((cols("n_items") \ "max") === JString(ni.getLong(1).toString))
    // an ANALYZEd model surfaces NDV/null counts in its catalog block
    // (absent before ANALYZE — never a wrong value)
    assert((cols("day") \ "approx_distinct") === JNothing)
    DeltaLite.analyzeTable(spark, s"$target/gold_daily_revenue")
    val catAnalyzed = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Pipeline.generateCatalog(target, order))), "UTF-8"))
    val cols2 = (catAnalyzed \ "nodes" \ "model.graft.gold_daily_revenue" \
      "columns").asInstanceOf[JObject].obj.toMap
    val days = DeltaLite.read(spark, s"$target/gold_daily_revenue")
      .select(col("day")).distinct().count()
    val gotNdv = asLong(cols2("day") \ "approx_distinct")
    assert(math.abs(gotNdv - days) <= math.max(2L, days / 10),
      s"catalog ndv $gotNdv must approximate $days")
    assert(asLong(cols2("day") \ "null_count") === 0L)
    // fully-built DAG → no errors
    assert((catalog \ "errors") === JNull || (catalog \ "errors") === JNothing)
    // a declared-but-unmaterialized model is NOT silently dropped: it
    // lands in `errors` so consumers can tell "not built" from "not
    // declared"
    val ghost = Pipeline.Model("ghost_model", Nil, (_, _) => fail("never"))
    val path2 = Pipeline.generateCatalog(target, order :+ ghost)
    val cat2 = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2)), "UTF-8"))
    val nodes2 = (cat2 \ "nodes").asInstanceOf[JObject].obj.toMap
    assert(nodes2.keySet === order.map(m => s"model.graft.${m.name}").toSet)
    val errs = (cat2 \ "errors") match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case other => fail(s"errors must list skipped models: $other")
    }
    assert(errs.exists(e => e.contains("ghost_model") && e.contains("skipped")))
  }

  test("dbt docs SITE: self-contained index.html embeds manifest + catalog and renders every node") {
    val target = Files.createTempDirectory("graft_docs_site").toString
    val order = Pipeline.dag(sf)
    Pipeline.runAll(spark, sf, target)
    Pipeline.generateCatalog(target, order)
    val path = Pipeline.generateDocsSite(target)
    assert(path.endsWith("index.html"))
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    // the embedded manifest carries every model node and the exposures
    order.foreach(m => assert(html.contains(s"model.graft.${m.name}"),
      s"node ${m.name} must embed"))
    assert(html.contains("exposure.graft.revenue_dashboard"))
    // script-safe embedding: the ONLY literal </script> is the real
    // closing tag — every "</" inside the JSON payloads is escaped, so
    // compiled code or column values can never truncate the page
    assert(html.sliding("</script>".length)
      .count(_ == "</script>") === 1, "exactly one closing script tag")
    // self-contained: no external assets to fetch (file:// serving)
    assert(!html.contains("http://") && !html.contains("https://"),
      "no external references")
    // catalog data reaches the page payload
    assert(html.contains("\"row_count\"") && html.contains("\"columns\""))
    // the lineage DAG renders SERVER-SIDE as inline SVG: one clickable
    // node per model + exposure, edges straight from child_map — the
    // graph view exists in the artifact itself, not just in JS
    assert(html.contains("Lineage graph") && html.contains("<svg"),
      "the lineage SVG must embed")
    assert(html.sliding("class=\"dagnode\"".length)
      .count(_ == "class=\"dagnode\"") ===
      order.length + 3, // + the three declared exposures
      "one DAG node per model and exposure")
    order.filter(_.deps.nonEmpty).foreach { m =>
      assert(html.contains(s"""data-to="model.graft.${m.name}""""),
        s"dependent model ${m.name} must have an inbound DAG edge")
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // a dbt-compatible manifest may carry source.*/seed.* PARENTS in
    // child_map that this pipeline doesn't emit as nodes — the SVG must
    // still lay them out and draw their edges (dbt's graph view shows
    // source lineage), never silently drop them while counting them
    // toward layer depth
    val mPath = java.nio.file.Paths.get(target, "manifest.json")
    val mj = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(mPath), "UTF-8"))
    val firstModel = s"model.graft.${order.head.name}"
    val withSource = mj.transformField {
      case ("child_map", JObject(o)) => ("child_map", JObject(
        ("source.graft.raw_events" -> JArray(List(JString(firstModel)))) :: o))
    }
    java.nio.file.Files.write(mPath,
      JsonMethods.pretty(JsonMethods.render(withSource)).getBytes("UTF-8"))
    val html2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Pipeline.generateDocsSite(target))), "UTF-8")
    assert(html2.contains("""data-from="source.graft.raw_events""""),
      "the source parent's edge must render")
    assert(html2.contains(">raw_events<") && html2.contains("#1f6f43"),
      "the source node must render in the third (source) style")
    // missing artifacts fail loudly, never render an empty site
    val empty = Files.createTempDirectory("graft_docs_empty").toString
    intercept[IllegalArgumentException] {
      Pipeline.generateDocsSite(empty)
    }
  }

  test("dbt test --store-failures: violating rows land in the audit table; rerun replaces") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft_storefail").toString
    // planted violation: accepted_values over an enum-ish column
    val dirty = Seq(
      (1L, "click", 1.0), (2L, "view", 2.0), (3L, "zorp", -1.0),
      (4L, "zap", 0.5)).toDF("event_id", "event_type", "value")
    val accepted = Seq("click", "view", "purchase", "signup")
    val failures = dirty.filter(!col("event_type").isInCollection(accepted))
    val (n1, v1) = Pipeline.storeTestFailures(spark, target,
      "accepted_values_events_event_type", "silver_events", "run-001",
      failures)
    assert(n1 === 2L && v1 === 0L)
    val audit = DeltaLite.read(spark,
      s"$target/dq_failures/accepted_values_events_event_type")
    assert(audit.count() === 2L)
    // the rows themselves are readable for triage, with run metadata
    assert(audit.select(col("event_type")).as[String].collect().sorted
      === Array("zap", "zorp"))
    assert(audit.select(col("_model")).distinct().as[String].collect()
      === Array("silver_events"))
    assert(audit.select(col("_invocation_id")).distinct().as[String]
      .collect() === Array("run-001"))
    // rerun after a partial fix REPLACES the audit contents (dbt
    // semantics) — and the prior run stays time-travelable in the log
    val fixedFailures = dirty.filter(col("event_type") === "zorp")
    val (n2, v2) = Pipeline.storeTestFailures(spark, target,
      "accepted_values_events_event_type", "silver_events", "run-002",
      fixedFailures)
    assert(n2 === 1L && v2 === 1L)
    val audit2 = DeltaLite.read(spark,
      s"$target/dq_failures/accepted_values_events_event_type")
    assert(audit2.count() === 1L)
    assert(audit2.select(col("_invocation_id")).as[String].collect()
      === Array("run-002"))
    val prior = DeltaLite.read(spark,
      s"$target/dq_failures/accepted_values_events_event_type", asOf = Some(0L))
    assert(prior.count() === 2L, "run-001 failures remain time-travelable")
    // a PASSING test stores an empty audit table, not an error
    val (n3, _) = Pipeline.storeTestFailures(spark, target,
      "not_null_events_value", "silver_events", "run-001",
      dirty.filter(col("value").isNull))
    assert(n3 === 0L)
    assert(DeltaLite.read(spark,
      s"$target/dq_failures/not_null_events_value").count() === 0L)
  }

  test("dbt unit tests: model logic runs against mock refs, never storage; diffs and misconfigurations report, not throw") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-03-01 11:30:45")
    // mock bronze: a duplicate event_id, a null event_type, a null
    // value — silver must dedup and drop both null rows
    val mockBronze = Seq(
      (1L, ts0, 7L, Option("click"), Option(1.5), "{}"),
      (1L, ts0, 7L, Option("click"), Option(1.5), "{}"), // dup event_id
      (2L, ts1, 7L, Option.empty[String], Option(2.0), "{}"),
      (3L, ts1, 9L, Option("view"), Option.empty[Double], "{}"),
      (4L, ts1, 9L, Option("view"), Option(4.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val expectSilver = Seq((1L, "click", 1.5), (4L, "view", 4.0))
      .toDF("event_id", "event_type", "value")
    // a SECOND model deeper in the DAG tests in isolation too: gold
    // aggregates a mock SILVER (upstream logic never runs)
    val mockSilver = Seq(
      (10L, ts0, 7L, "click", 1.0, "{}", ts0),
      (11L, ts0, 7L, "click", 2.5, "{}", ts0),
      (12L, ts1, 9L, "view", 3.0, "{}", ts1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props",
        "ts_sec")
    val expectGold = Seq(("2024-03-01", "click", 2L, 3.5),
      ("2024-03-01", "view", 1L, 3.0))
      .toDF("day", "event_type", "n", "sum_value")
    val models = Pipeline.dag(sf)
    val results = Pipeline.runUnitTests(spark, models, Seq(
      Pipeline.UnitTest("silver_dedups_and_filters", "silver_events",
        Map("bronze_events" -> mockBronze), expectSilver),
      Pipeline.UnitTest("gold_daily_rollup", "gold_daily_events",
        Map("silver_events" -> mockSilver), expectGold),
      // a WRONG expectation reports the diff instead of throwing
      Pipeline.UnitTest("wrong_expectation", "silver_events",
        Map("bronze_events" -> mockBronze),
        Seq((1L, "click"), (2L, "oops")).toDF("event_id", "event_type")),
      // a missing fixture reports which ref lacks a mock
      Pipeline.UnitTest("missing_fixture", "silver_events",
        Map.empty, expectSilver),
      // asserting a column the model never produces fails loudly
      Pipeline.UnitTest("phantom_column", "silver_events",
        Map("bronze_events" -> mockBronze),
        Seq((1L, "x")).toDF("event_id", "no_such_col"))))
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("silver_dedups_and_filters").passed,
      byName("silver_dedups_and_filters").detail)
    assert(byName("gold_daily_rollup").passed,
      byName("gold_daily_rollup").detail)
    val wrong = byName("wrong_expectation")
    assert(!wrong.passed && wrong.detail.contains("unexpected row value"),
      wrong.detail)
    val miss = byName("missing_fixture")
    assert(!miss.passed && miss.detail.contains("bronze_events"),
      miss.detail)
    val phantom = byName("phantom_column")
    assert(!phantom.passed && phantom.detail.contains("no_such_col"),
      phantom.detail)
  }

  test("dbt test severity config: error_if/warn_if thresholds classify outcomes in dbt's order") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft_severity").toString
    def failuresOf(n: Int) =
      (0 until n).map(i => (i.toLong, s"bad$i")).toDF("id", "why")
    def run(n: Int, cfg: Pipeline.TestConfig) =
      Pipeline.runTest(spark, target, "t_sev", "m", "run-1",
        failuresOf(n), cfg)
    import Pipeline.TestConfig
    // defaults: severity error, error_if !=0 — any failure errors
    assert(run(0, TestConfig()).status === "pass")
    assert(run(1, TestConfig()).status === "error")
    // thresholded: error past 100, warn past 10, else pass
    val tiered = TestConfig(errorIf = ">100", warnIf = ">10")
    assert(run(5, tiered).status === "pass")
    assert(run(50, tiered).status === "warn")
    assert(run(150, tiered).status === "error")
    assert(run(150, tiered).failures === 150L)
    // severity warn: error_if is SKIPPED entirely (dbt's decision
    // order) — even a count that meets it only warns
    val soft = TestConfig(severity = "warn", errorIf = "!=0")
    assert(run(999, soft).status === "warn")
    assert(run(0, soft).status === "pass")
    // store-failures composes: the audit table lands on a WARN too
    val stored = run(3, TestConfig(errorIf = ">10", storeFailures = true))
    assert(stored.status === "warn" && stored.auditVersion.isDefined)
    assert(DeltaLite.read(spark, s"$target/dq_failures/t_sev")
      .count() === 3L)
    // unparseable conditions fail loudly, not silently-pass
    intercept[IllegalArgumentException] {
      run(1, TestConfig(errorIf = "lots"))
    }
    intercept[IllegalArgumentException] {
      TestConfig(severity = "fatal")
    }
  }

  test("multimodal: dHash is deterministic, batch path matches the kernel, census coheres") {
    import spark.implicits._
    import graft.functions.Multimodal
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // kernel determinism + identical-payload collision (the exact-dup case)
    val a = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    assert(Multimodal.dHashStub(a) === Multimodal.dHashStub(a.clone()))
    // the batch (mapPartitions) path produces exactly the kernel's hashes
    val media = Tables.t(spark, sf, "documents").limit(200)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
    val fromBatch = Multimodal.perceptualHashes(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = media.as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> Multimodal.dHashStub(b) }.toMap
    assert(fromBatch === direct)
    // the near-dup census is internally coherent: verified ≤ candidates,
    // and every identical-text pair hashes identically (exact dups ≥
    // text dups within the sampled frame)
    val row = SparkEntry.queries("m5_perceptual_dedup")(spark, sf).head()
    val nCand = row.getAs[Long]("n_candidate_pairs")
    val nNear = row.getAs[Long]("n_near_dup_pairs")
    val nDistinct = row.getAs[Long]("n_distinct_hashes")
    assert(nNear <= nCand)
    assert(nDistinct > 0L)
    if (nCand > 0L) {
      assert(row.getAs[Int]("min_ham") >= 1,
        "candidate pairs are over DISTINCT hashes — Hamming ≥ 1")
      assert(row.getAs[Int]("max_ham") <= 64)
    }
  }

  test("dbt source freshness: thresholds status each source; sources.json artifact") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_fresh").toString
    // anchor on the fixture's own newest event so statuses are planted,
    // not guessed: asOf = 2h after the newest row
    val maxTs = Tables.t(spark, sf, "events")
      .agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val asOf = new java.sql.Timestamp((maxTs + 7200L) * 1000L)
    val specs = Seq(
      Pipeline.SourceFreshness("events", "ts", 86400L, 172800L), // 2h < 1d
      Pipeline.SourceFreshness("events", "ts", 3600L, 1000000000L), // 2h > 1h
      Pipeline.SourceFreshness("lineitem", "l_shipdate", 60L, 3600L))
    val res = Pipeline.checkSourceFreshness(spark, sf, target,
      Seq(specs.head), asOf)
    assert(res("events")._1 === "pass")
    assert(res("events")._3 === 7200L, "age is asOf - max(loaded_at)")
    val warn = Pipeline.checkSourceFreshness(spark, sf, target,
      Seq(specs(1)), asOf)
    assert(warn("events")._1 === "warn")
    val err = Pipeline.checkSourceFreshness(spark, sf, target,
      Seq(specs(2)), asOf)
    assert(err("lineitem")._1 === "error",
      "1992-1998 ship dates are years past any 1h threshold")
    // the artifact carries dbt's shape: unique_id, status, criteria
    Pipeline.checkSourceFreshness(spark, sf, target, specs, asOf)
    val doc = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target, "sources.json")), "UTF-8"))
    val rs = (doc \ "results").asInstanceOf[JArray].arr
    assert(rs.size === 3)
    assert((rs.head \ "unique_id") === JString("source.graft.events"))
    assert((rs.head \ "status") === JString("pass"))
    assert((rs(1) \ "status") === JString("warn"))
    assert((rs(2) \ "status") === JString("error"))
    assert((rs.head \ "criteria" \ "warn_after") !== JNothing)
  }

  test("dbt seed: CSV lands as a DAG node; content edit re-fingerprints the subtree") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_seed")
    val csv = dir.resolve("region_map.csv")
    java.nio.file.Files.write(csv,
      "code,region\nA,north\nB,south\n".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("code", StringType),
      StructField("region", StringType)))
    def dag() = {
      val seed = Pipeline.seedModel("region_map", csv.toString, schema)
      Seq(seed, Pipeline.Model("regions_upper", Seq("region_map"),
        (s, ref) => ref("region_map")
          .select(col("code"), upper(col("region")).as("region_u")),
        code = "select code, upper(region) from ref(region_map)"))
    }
    val target = dir.resolve("target").toString
    Pipeline.run(spark, dag(), target)
    assert(DeltaLite.read(spark, s"$target/region_map").count() === 2L)
    assert(DeltaLite.read(spark, s"$target/regions_upper")
      .filter(col("region_u") === "NORTH").count() === 1L)
    // unchanged rerun: both nodes reuse (fingerprint covers the CSV hash)
    Pipeline.run(spark, dag(), target, selective = true)
    assert(DeltaLite.latestVersion(s"$target/region_map") === Some(0L))
    assert(DeltaLite.latestVersion(s"$target/regions_upper") === Some(0L))
    // editing the seed CONTENT re-fingerprints seed + descendant
    java.nio.file.Files.write(csv,
      "code,region\nA,north\nB,south\nC,east\n".getBytes("UTF-8"))
    Pipeline.run(spark, dag(), target, selective = true)
    assert(DeltaLite.read(spark, s"$target/region_map").count() === 3L)
    assert(DeltaLite.read(spark, s"$target/regions_upper").count() === 3L)
    assert(DeltaLite.latestVersion(s"$target/region_map").get >= 1L)
  }

  test("semantic layer: metric spec compiles to engine-portable SQL") {
    val m = Pipeline.metrics.head
    assert(m.name === "revenue_cents" && m.model === "gold_daily_revenue")
    val sql = Pipeline.compileMetricSql(m, "month")
    // the compiled text is closed-form and engine-portable: date_trunc
    // at the grain, the declared measure under the declared agg, ordinal
    // grouping — the d12 oracle runs this VERBATIM on DuckDB
    assert(sql ===
      "SELECT CAST(date_trunc('month', day) AS DATE) AS day_month, " +
        "CAST(sum(CAST(round(revenue * 100) AS BIGINT)) AS BIGINT) " +
        "AS revenue_cents " +
        "FROM gold_daily_revenue GROUP BY 1 " +
        "ORDER BY 1 ASC NULLS LAST")
    // grain is a compile-time parameter: same spec, other rollup
    assert(Pipeline.compileMetricSql(m, "year").contains("date_trunc('year'"))
    // a dimensioned metric interleaves dims between grain and measure
    val dim = Pipeline.Metric("events", "gold_daily_events", "sum", "n",
      "day", dims = Seq("event_type"))
    assert(Pipeline.compileMetricSql(dim, "week") ===
      "SELECT CAST(date_trunc('week', day) AS DATE) AS day_week, " +
        "event_type, CAST(sum(n) AS BIGINT) AS events " +
        "FROM gold_daily_events GROUP BY 1, 2 " +
        "ORDER BY 1 ASC NULLS LAST, 2 ASC NULLS LAST")
    // derived metric: resolves declared inputs by name, one-pass both
    // measures, engine-portable milli-unit floor ratio
    val dsql = Pipeline.compileDerivedMetricSql(
      Pipeline.DerivedMetric("avg_item_milli_cents",
        "revenue_cents", "items_sold"), "month")
    assert(dsql.contains("AS revenue_cents, ") &&
      dsql.contains("AS items_sold, ") &&
      dsql.contains("CAST(floor((1000.0 * ") &&
      dsql.contains("AS avg_item_milli_cents"))
    // saved query: several metrics + shared dims + grain in ONE pass;
    // where: params conjoin ahead of the aggregate (reach the scan)
    val sq = Pipeline.SavedQuery("rollup", Seq("events", "event_value_cents"),
      Seq("event_type"), "month", where = Seq("event_type <> 'view'"))
    val ssql = Pipeline.compileSavedQuerySql(sq)
    assert(ssql.contains("AS events, ") || ssql.contains("AS events "),
      s"saved query must emit every metric: $ssql")
    assert(ssql.contains("AS event_value_cents"))
    assert(ssql.contains("FROM gold_daily_events WHERE (event_type <> 'view') GROUP BY 1, 2"))
    assert(ssql.indexOf("sum(") === ssql.lastIndexOf("sum(CAST") ||
      ssql.split("FROM").length === 2, "one pass: a single FROM clause")
    // undeclared dim and cross-model metric mixes are rejected
    intercept[IllegalArgumentException] {
      Pipeline.compileSavedQuerySql(Pipeline.SavedQuery("bad",
        Seq("events", "revenue_cents"), Nil, "month"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.compileSavedQuerySql(Pipeline.SavedQuery("bad",
        Seq("revenue_cents", "items_sold"), Seq("event_type"), "month"))
    }
    // unknown input and cross-model inputs are rejected at compile time
    intercept[IllegalArgumentException] {
      Pipeline.compileDerivedMetricSql(
        Pipeline.DerivedMetric("x", "no_such_metric", "items_sold"), "month")
    }
    intercept[IllegalArgumentException] {
      Pipeline.compileDerivedMetricSql(
        Pipeline.DerivedMetric("x", "revenue_cents", "events"), "month")
    }
  }

  test("dbt on_schema_change: ignore / append_new_columns / sync_all_columns / fail") {
    import spark.implicits._
    def build(): String = {
      val path = Files.createTempDirectory("graft_oschg").toString
      DeltaLite.create(spark, path,
        Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
      path
    }
    // the widened source every mode is exercised against: a NEW column
    // (tag) and a REMOVED one (v)
    val widened = Seq((3L, 3.0, "x"), (4L, 4.0, "y")).toDF("k", "v", "tag")
    val narrowed = Seq((5L, "z")).toDF("k", "tag")

    // ignore (dbt default): new column dropped, target schema unchanged
    val p1 = build()
    Pipeline.incrementalAppend(spark, p1, widened, "ignore")
    val r1 = DeltaLite.read(spark, p1)
    assert(r1.columns.toSeq === Seq("k", "v"))
    assert(r1.count() === 4)

    // append_new_columns: tag evolves in; old rows read it as NULL
    val p2 = build()
    Pipeline.incrementalAppend(spark, p2, widened, "append_new_columns")
    val r2 = DeltaLite.read(spark, p2)
    assert(r2.columns.toSeq === Seq("k", "v", "tag"))
    assert(r2.filter($"tag".isNull).count() === 2)
    assert(r2.filter($"tag".isNotNull).count() === 2)
    // a batch missing an existing column keeps it, NULL for new rows
    Pipeline.incrementalAppend(spark, p2, narrowed, "append_new_columns")
    val r2b = DeltaLite.read(spark, p2)
    assert(r2b.columns.toSeq === Seq("k", "v", "tag"))
    assert(r2b.filter($"k" === 5L && $"v".isNull).count() === 1)

    // sync_all_columns: v is DROPPED (metadata-only), tag evolves in
    val p3 = build()
    Pipeline.incrementalAppend(spark, p3, narrowed, "sync_all_columns")
    val r3 = DeltaLite.read(spark, p3)
    assert(r3.columns.toSeq === Seq("k", "tag"))
    assert(r3.count() === 3)
    assert(r3.filter($"k" === 5L).select("tag").head().getString(0) === "z")

    // fail: raises BEFORE any commit — version stays put
    val p4 = build()
    val v0 = DeltaLite.latestVersion(p4).get
    val ex = intercept[IllegalArgumentException] {
      Pipeline.incrementalAppend(spark, p4, widened, "fail")
    }
    assert(ex.getMessage.contains("on_schema_change=fail"))
    assert(ex.getMessage.contains("tag"))
    assert(DeltaLite.latestVersion(p4).get === v0)
    // fail with an IDENTICAL schema is a plain append
    Pipeline.incrementalAppend(spark, p4,
      Seq((9L, 9.0)).toDF("k", "v"), "fail")
    assert(DeltaLite.read(spark, p4).count() === 3)

    // unknown policy names are rejected
    intercept[IllegalArgumentException] {
      Pipeline.incrementalAppend(spark, p4, widened, "explode")
    }
  }

  test("dbt model versions: ref pins and floats, manifest stamps versions + deprecation, warnings surface") {
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val target = Files.createTempDirectory("graft_mversions").toString
    // dim_parts v1 (cents as DOUBLE dollars) → v2 (exact BIGINT cents,
    // breaking rename) — the classic governed migration. v1 carries a
    // past deprecation_date; v2 is the declared latest.
    val v1 = Pipeline.Model("dim_parts", Nil,
      (s, _) => Seq((1L, 1.5), (2L, 2.5)).toDF("part_id", "price"),
      code = "select part_id, price from src", version = Some(1),
      latestVersion = Some(2), deprecationDate = Some("2020-01-01"))
    val v2 = Pipeline.Model("dim_parts", Nil,
      (s, _) => Seq((1L, 150L), (2L, 250L)).toDF("part_id", "price_cents"),
      code = "select part_id, price_cents from src", version = Some(2),
      latestVersion = Some(2))
    // one consumer PINNED to v1 (not yet migrated), one FLOATING on the
    // family name (rides latest automatically)
    val pinned = Pipeline.Model("legacy_report", Seq("dim_parts.v1"),
      (_, ref) => ref("dim_parts.v1").withColumn("doubled", col("price") * 2),
      code = "select *, price * 2 as doubled from ref(dim_parts, v=1)")
    val floating = Pipeline.Model("parts_mart", Seq("dim_parts"),
      (_, ref) => ref("dim_parts").withColumn("doubled_cents", col("price_cents") * 2L),
      code = "select *, price_cents * 2 as doubled_cents from ref(dim_parts)")
    val models = Seq(v1, v2, pinned, floating)
    val out = Pipeline.run(spark, models, target)
    // node ids are name.vN; tables materialize under the versioned alias
    assert(out.keySet === Set("dim_parts.v1", "dim_parts.v2",
      "legacy_report", "parts_mart"))
    assert(DeltaLite.read(spark, s"$target/dim_parts_v1").columns.toSeq
      === Seq("part_id", "price"))
    assert(DeltaLite.read(spark, s"$target/dim_parts_v2").columns.toSeq
      === Seq("part_id", "price_cents"))
    // the pinned consumer read v1, the floating one resolved latest=v2
    assert(DeltaLite.read(spark, s"$target/legacy_report").columns.toSeq
      === Seq("part_id", "price", "doubled"))
    val mart = DeltaLite.read(spark, s"$target/parts_mart")
    assert(mart.columns.toSeq === Seq("part_id", "price_cents", "doubled_cents"))
    assert(mart.filter(col("part_id") === 1L)
      .select("doubled_cents").head().getLong(0) === 300L)
    // manifest records BOTH versions with latest_version + deprecation
    val manifest = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$target/manifest.json")), "UTF-8"))
    val nodes = (manifest \ "nodes").asInstanceOf[JObject].obj.toMap
    assert(nodes.contains("model.graft.dim_parts.v1"))
    assert(nodes.contains("model.graft.dim_parts.v2"))
    assert((nodes("model.graft.dim_parts.v1") \ "version") === JInt(1))
    assert((nodes("model.graft.dim_parts.v1") \ "latest_version") === JInt(2))
    assert((nodes("model.graft.dim_parts.v1") \ "deprecation_date") === JString("2020-01-01"))
    assert((nodes("model.graft.dim_parts.v2") \ "version") === JInt(2))
    assert((nodes("model.graft.dim_parts.v2") \ "deprecation_date") === JNothing)
    // ref edges resolve to concrete versions in depends_on
    def depsOf(id: String): Seq[String] =
      (nodes(id) \ "depends_on" \ "nodes") match {
        case JArray(xs) => xs.collect { case JString(x) => x }
        case other => fail(s"bad depends_on: $other")
      }
    assert(depsOf("model.graft.legacy_report") === Seq("model.graft.dim_parts.v1"))
    assert(depsOf("model.graft.parts_mart") === Seq("model.graft.dim_parts.v2"))
    // deprecation + non-latest-pin warnings land in run_results.json
    val rr = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$target/run_results.json")), "UTF-8"))
    val warns = (rr \ "warnings") match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case other => fail(s"bad warnings: $other")
    }
    assert(warns.exists(w => w.contains("legacy_report") &&
      w.contains("deprecated since 2020-01-01")))
    assert(warns.exists(w => w.contains("legacy_report") &&
      w.contains("not the latest version (dim_parts.v2)")))
    assert(!warns.exists(_.contains("parts_mart")))
    // state:modified+ still works across versions: editing v2 rebuilds
    // v2 and the FLOATING consumer only; v1 and the pinned consumer reuse
    val v2b = v2.copy(code = v2.code + " -- edited")
    val out2 = Pipeline.run(spark, Seq(v1, v2b, pinned, floating), target,
      selective = true)
    val rr2 = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$target/run_results.json")), "UTF-8"))
    val statuses = (rr2 \ "results") match {
      case JArray(xs) => xs.map(x => (
        (x \ "unique_id").asInstanceOf[JString].s,
        (x \ "status").asInstanceOf[JString].s)).toMap
      case other => fail(s"bad results: $other")
    }
    assert(statuses("model.graft.dim_parts.v1") === "reused")
    assert(statuses("model.graft.legacy_report") === "reused")
    assert(statuses("model.graft.dim_parts.v2") === "success")
    assert(statuses("model.graft.parts_mart") === "success")
  }

  test("dbt groups/access: private models are referenceable only within their group") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft_access").toString
    def core(consumerGroup: Option[String]) = Seq(
      Pipeline.Model("core_int", Nil,
        (s, _) => Seq((1L, 10L)).toDF("k", "v"),
        group = Some("core"), access = "private"),
      Pipeline.Model("mart", Seq("core_int"),
        (_, ref) => ref("core_int"), group = consumerGroup))
    // same group: resolves and builds
    val out = Pipeline.run(spark, core(Some("core")), target)
    assert(out.contains("mart"))
    // cross-group ref to a PRIVATE model: parse-time error, nothing built
    val target2 = Files.createTempDirectory("graft_access2").toString
    val ex = intercept[IllegalArgumentException] {
      Pipeline.run(spark, core(Some("finance")), target2)
    }
    assert(ex.getMessage.contains("access violation"))
    assert(ex.getMessage.contains("core_int"))
    assert(DeltaLite.latestVersion(s"$target2/core_int").isEmpty,
      "an access violation must fail before any build")
    // protected (default) resolves across groups
    val target3 = Files.createTempDirectory("graft_access3").toString
    val prot = Seq(
      Pipeline.Model("core_pub", Nil,
        (s, _) => Seq((1L, 10L)).toDF("k", "v"), group = Some("core")),
      Pipeline.Model("mart2", Seq("core_pub"),
        (_, ref) => ref("core_pub"), group = Some("finance")))
    assert(Pipeline.run(spark, prot, target3).contains("mart2"))
  }

  test("dbt clone: zero-copy dev environment, selective rebuild over cloned state, prod untouched") {
    val prod = Files.createTempDirectory("graft_cloneprod").toString
    val dev = Files.createTempDirectory("graft_clonedev").toString
    val models = Pipeline.dag(sf)
    Pipeline.run(spark, models, prod)
    val prodVersions = models.map(m =>
      m.name -> DeltaLite.latestVersion(s"$prod/${m.name}").get).toMap
    // clone: every prod table arrives as a shallow clone — metadata
    // only, data files still referenced from prod by absolute path
    val cloned = Pipeline.cloneEnv(spark, prod, dev, models)
    assert(cloned.keySet === models.map(_.name).toSet)
    models.foreach { m =>
      val snap = DeltaLite.snapshot(s"$dev/${m.name}")
      assert(snap.files.forall(f =>
        java.nio.file.Paths.get(f.path).isAbsolute &&
        f.path.startsWith(prod)),
        s"clone of ${m.name} must reference prod files, not copies")
      // identical content through the clone
      assert(DeltaLite.read(spark, s"$dev/${m.name}").count() ===
        DeltaLite.read(spark, s"$prod/${m.name}").count())
    }
    // a dev edit to ONE leaf model: selective run rebuilds exactly it,
    // everything else reuses the cloned materializations (fingerprints
    // rode the clone's properties)
    val edited = models.map(m =>
      if (m.name == "gold_daily_revenue") m.copy(code = m.code + " -- dev edit")
      else m)
    Pipeline.run(spark, edited, dev, selective = true)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rr = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dev/run_results.json")), "UTF-8"))
    val statuses = (rr \ "results") match {
      case JArray(xs) => xs.map(x => (
        (x \ "unique_id").asInstanceOf[JString].s,
        (x \ "status").asInstanceOf[JString].s)).toMap
      case other => fail(s"bad results: $other")
    }
    assert(statuses("model.graft.gold_daily_revenue") === "success")
    assert(statuses("model.graft.bronze_events") === "reused")
    assert(statuses("model.graft.silver_events") === "reused")
    assert(statuses("model.graft.gold_daily_events") === "reused")
    // prod never moved
    models.foreach(m => assert(
      DeltaLite.latestVersion(s"$prod/${m.name}").get === prodVersions(m.name)))
    // re-clone is a no-op on existing dev tables (dbt clone default)
    val devRevVersion = DeltaLite.latestVersion(s"$dev/gold_daily_revenue").get
    Pipeline.cloneEnv(spark, prod, dev, models)
    assert(DeltaLite.latestVersion(s"$dev/gold_daily_revenue").get === devRevVersion)
  }

  test("dbt incremental merge strategy: on_schema_change + incremental_predicates compose") {
    import spark.implicits._
    def build(): String = {
      val path = Files.createTempDirectory("graft_incmerge").toString
      val jan = Seq((1L, "2024-01-15", 1.0), (2L, "2024-01-15", 2.0))
        .toDF("k", "d", "v").withColumn("day", to_date(col("d"))).drop("d")
        .select(col("k"), col("day"), col("v")).coalesce(1)
      val feb = Seq((3L, "2024-02-15", 3.0), (4L, "2024-02-15", 4.0))
        .toDF("k", "d", "v").withColumn("day", to_date(col("d"))).drop("d")
        .select(col("k"), col("day"), col("v")).coalesce(1)
      DeltaLite.create(spark, path, jan)
      DeltaLite.append(spark, path, feb)
      path
    }
    val widened = Seq((3L, "2024-03-01", -3.0, "x"), (5L, "2024-03-01", -5.0, "y"))
      .toDF("k", "d", "v", "tag").withColumn("day", to_date(col("d"))).drop("d")
      .select(col("k"), col("day"), col("v"), col("tag"))
    val preds = Seq("day >= DATE'2024-02-01'")

    // ignore + predicate: tag dropped, key 3 updated (in scope), key 5
    // inserted; Jan rows untouched and invisible to the merge
    val p1 = build()
    Pipeline.incrementalMerge(spark, p1, widened, Seq("k"), "ignore", preds)
    val r1 = DeltaLite.read(spark, p1)
    assert(r1.columns.toSeq === Seq("k", "day", "v"))
    assert(r1.count() === 5)
    assert(r1.filter(col("k") === 3L).select("v").head().getDouble(0) === -3.0)
    assert(r1.filter(col("k") <= 2L && col("v") > 0).count() === 2)

    // append_new_columns + predicate: tag evolves in, old rows NULL
    val p2 = build()
    Pipeline.incrementalMerge(spark, p2, widened, Seq("k"),
      "append_new_columns", preds)
    val r2 = DeltaLite.read(spark, p2)
    assert(r2.columns.toSeq === Seq("k", "day", "v", "tag"))
    assert(r2.filter(col("tag").isNotNull).count() === 2)

    // sync_all_columns: a batch missing v drops it (keys survive)
    val p3 = build()
    val narrowed = Seq((4L, "2024-03-02", "z"))
      .toDF("k", "d", "tag").withColumn("day", to_date(col("d"))).drop("d")
      .select(col("k"), col("day"), col("tag"))
    Pipeline.incrementalMerge(spark, p3, narrowed, Seq("k"),
      "sync_all_columns", preds)
    val r3 = DeltaLite.read(spark, p3)
    assert(r3.columns.toSeq === Seq("k", "day", "tag"))
    assert(r3.filter(col("k") === 4L).select("tag").head().getString(0) === "z")

    // fail raises before any commit
    val p4 = build()
    val v0 = DeltaLite.latestVersion(p4).get
    intercept[IllegalArgumentException] {
      Pipeline.incrementalMerge(spark, p4, widened, Seq("k"), "fail", preds)
    }
    assert(DeltaLite.latestVersion(p4).get === v0)
  }

  test("dbt retry: failures and never-reached models rebuild, completed models reuse") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft_retry").toString
    val flag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val models = Seq(
      Pipeline.Model("stable", Nil,
        (s, _) => Seq((1L, "a")).toDF("k", "v"), code = "stable v1"),
      Pipeline.Model("flaky", Nil,
        (s, _) => { if (!flag.get) sys.error("upstream outage")
          Seq((2L, "b")).toDF("k", "v") }, code = "flaky v1"),
      Pipeline.Model("downstream", Seq("flaky"),
        (_, ref) => ref("flaky"), code = "downstream v1"))
    intercept[RuntimeException] { Pipeline.run(spark, models, target) }
    // partial artifacts: the error status is recorded, stable completed
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def statuses(): Map[String, String] = {
      val rr = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$target/run_results.json")), "UTF-8"))
      (rr \\ "results") match {
        case JArray(xs) => xs.map(x => (
          (x \\ "unique_id").asInstanceOf[JString].s,
          (x \\ "status").asInstanceOf[JString].s)).toMap
        case other => fail(s"bad results: $other")
      }
    }
    assert(statuses()("model.graft.flaky").startsWith("error"))
    assert(DeltaLite.latestVersion(s"$target/downstream").isEmpty)
    // outage over: retry reuses stable, builds flaky + downstream
    flag.set(true)
    Pipeline.retry(spark, models, target)
    val st = statuses()
    assert(st("model.graft.stable") === "reused")
    assert(st("model.graft.flaky") === "success")
    assert(st("model.graft.downstream") === "success")
    assert(DeltaLite.read(spark, s"$target/downstream").count() === 1)
  }

  test("dbt node selection: +/@/tag operators; runSelect builds the selection, defers the rest") {
    import spark.implicits._
    // diamond + tag: bronze → {silver_a (tag hot), silver_b} → gold
    val models = Seq(
      Pipeline.Model("bronze", Nil,
        (s, _) => Seq((1L, 10L), (2L, 20L)).toDF("k", "v")),
      Pipeline.Model("silver_a", Seq("bronze"),
        (_, ref) => ref("bronze").withColumn("va", col("v") * 2L),
        tags = Seq("hot")),
      Pipeline.Model("silver_b", Seq("bronze"),
        (_, ref) => ref("bronze").withColumn("vb", col("v") + 1L)),
      Pipeline.Model("gold", Seq("silver_a", "silver_b"),
        (_, ref) => ref("silver_a").join(ref("silver_b"), "k")
          .select(col("k"), col("va"), col("vb")), tags = Seq("hot")))
    def names(spec: String) = Pipeline.select(models, spec).map(_.name)
    assert(names("silver_a") === Seq("silver_a"))
    assert(names("+gold") === Seq("bronze", "silver_a", "silver_b", "gold"))
    assert(names("bronze+") === Seq("bronze", "silver_a", "silver_b", "gold"))
    assert(names("silver_a+") === Seq("silver_a", "gold"))
    assert(names("+silver_a") === Seq("bronze", "silver_a"))
    assert(names("+silver_a+") === Seq("bronze", "silver_a", "gold"))
    // @silver_a = itself + descendants (gold) + gold's OTHER ancestors
    assert(names("@silver_a") === Seq("bronze", "silver_a", "silver_b", "gold"))
    assert(names("tag:hot") === Seq("silver_a", "gold"))
    assert(names("silver_a silver_b") === Seq("silver_a", "silver_b"))
    intercept[IllegalArgumentException] { Pipeline.select(models, "zorp") }

    // runSelect: unselected upstreams DEFER to their materialization
    val target = Files.createTempDirectory("graft_select").toString
    Pipeline.run(spark, models, target) // full first build
    val bronzeV = DeltaLite.latestVersion(s"$target/bronze").get
    Pipeline.runSelect(spark, models, target, "silver_a+")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rr = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$target/run_results.json")), "UTF-8"))
    val st = (rr \\ "results") match {
      case JArray(xs) => xs.map(x => (
        (x \\ "unique_id").asInstanceOf[JString].s,
        (x \\ "status").asInstanceOf[JString].s)).toMap
      case other => fail(s"bad results: $other")
    }
    // manifest nodes carry tags + compiled code (dbt's fields)
    val mf = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$target/manifest.json")), "UTF-8"))
    val goldNode = (mf \\ "nodes") \\ "model.graft.gold"
    assert((goldNode \\ "tags") === JArray(List(JString("hot"))))
    assert((goldNode \\ "compiled_code") === JString(""))
    assert(st("model.graft.bronze") === "deferred")
    assert(st("model.graft.silver_b") === "deferred")
    assert(st("model.graft.silver_a") === "success")
    assert(st("model.graft.gold") === "success")
    assert(DeltaLite.latestVersion(s"$target/bronze").get === bronzeV,
      "a deferred model never commits")
    // a selection whose deferred upstream was never built fails loudly
    val empty = Files.createTempDirectory("graft_select2").toString
    val ex = intercept[Exception] {
      Pipeline.runSelect(spark, models, empty, "gold")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("defer")), s"got: $ex")
  }
}
