package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-function coverage (SURVEY.md §2.7): string / date / math / array /
  * struct+map / JSON / hash families, plus explode (the UDTF analogue,
  * §2.10) and the multimodal-metadata path (§2.9 / builder prompt).
  *
  * Every function here is a built-in `org.apache.spark.sql.functions`
  * column expression → whole-stage-codegen'd; no UDFs anywhere (the
  * reference's DuckDB scalar functions are vectorized C++; Spark's codegen
  * builtins are the equivalent — SURVEY §2.10).
  *
  * Parity notes baked in:
  *  - DuckDB returns BIGINT where Spark returns INT (length, levenshtein,
  *    year, ceil, ...) → oracle casts down.
  *  - transcendental fns (ln/exp/pow) may differ in the last ulp between
  *    libm and the JVM → rounded to 6 decimals via the shared
  *    `round(x*1e6)/1e6` form (bit-identical in both engines).
  *  - `events.props` JSON is extracted with get_json_object/from_json on
  *    the Spark side; the oracle uses regexp_extract so it cannot depend
  *    on DuckDB's json extension being loadable.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- F1
    QueryDef("f1_string_funcs", (s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lower_name"),
        upper(col("p_brand")).as("upper_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_sub8"),
        regexp_replace(col("p_name"), " ", "_").as("name_und"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        col("p_type").contains("a").as("has_a"),
        col("p_name").startsWith("b").as("starts_b"),
        trim(lit("  x  ")).as("trimmed"),
        expr("left(p_name, 3)").as("left3"),
        expr("right(p_name, 3)").as("right3"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev"))
        .orderBy(col("p_partkey").asc_nulls_last)
    }, Some(
      """SELECT p_partkey,
         lower(p_name) AS lower_name,
         upper(p_brand) AS upper_brand,
         CAST(length(p_name) AS INTEGER) AS name_len,
         substr(p_name, 1, 8) AS name_sub8,
         replace(p_name, ' ', '_') AS name_und,
         string_split(p_name, ' ')[1] AS first_word,
         regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
         p_brand || ':' || p_type AS brand_type,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
         contains(p_type, 'a') AS has_a,
         starts_with(p_name, 'b') AS starts_b,
         trim('  x  ') AS trimmed,
         left(p_name, 3) AS left3,
         right(p_name, 3) AS right3,
         CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS lev
         FROM part ORDER BY p_partkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F2
    QueryDef("f2_date_funcs", (s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        col("o_orderdate").cast("date").as("odate"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since_95"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("next_day"),
        make_date(lit(2024), month(col("o_orderdate")), lit(1)).as("anniv"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mo,
         CAST(day(o_orderdate) AS INTEGER) AS dom,
         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
         CAST(o_orderdate AS DATE) AS odate,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(o_orderdate AS DATE) + 30 AS due_date,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
         o_orderdate + INTERVAL 1 DAY AS next_day,
         make_date(2024, CAST(month(o_orderdate) AS INTEGER), 1) AS anniv,
         strftime(o_orderdate, '%Y-%m') AS ym
         FROM orders ORDER BY o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- F2 (b)
    // Calendar arithmetic beyond the plain extracts: ISO weeks, month-end
    // boundaries, next-weekday scheduling, month-offset bucketing. DuckDB
    // has no next_day, so the oracle derives it from isodow arithmetic —
    // same semantics (strictly-after next Monday), different spelling.
    QueryDef("f13_calendar", (s, dir) => {
      val d = col("o_orderdate").cast("date")
      t(s, dir, "orders").select(
        col("o_orderkey"),
        weekofyear(d).as("iso_week"),
        dayofweek(d).as("dow"),
        dayofyear(d).as("doy"),
        last_day(d).as("month_end"),
        next_day(d, "Mon").as("next_monday"),
        add_months(d, 2).as("plus_2mo"),
        date_trunc("week", d).cast("date").as("week_start"))
        .orderBy(col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_orderkey,
         CAST(week(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
         CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
         last_day(CAST(o_orderdate AS DATE)) AS month_end,
         CAST(o_orderdate AS DATE) +
           CAST(CASE WHEN (1 - isodow(CAST(o_orderdate AS DATE)) + 7) % 7 = 0
                     THEN 7
                     ELSE (1 - isodow(CAST(o_orderdate AS DATE)) + 7) % 7
                END AS INTEGER) AS next_monday,
         CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
         CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start
         FROM orders ORDER BY o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F3
    QueryDef("f3_math_funcs", (s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.04).as("abs_dev"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        (round((col("l_extendedprice"))*100)/100).as("price_r2"),
        (round((pow(col("l_quantity"), 2))*1000000)/1000000).as("qty_sq"),
        (round((sqrt(col("l_extendedprice")))*1000000)/1000000).as("price_sqrt"),
        (round((log(col("l_extendedprice")))*1000000)/1000000).as("price_ln"),
        (round((log10(col("l_extendedprice")))*1000000)/1000000).as("price_log10"),
        (round((exp(col("l_discount")))*1000000)/1000000).as("disc_exp"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
        least(col("l_quantity"), lit(25.0)).as("qty_lo"),
        (col("l_orderkey") % 7).as("key_mod7"))
        .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
    }, Some(
      """SELECT l_orderkey, l_linenumber,
         abs(l_discount - 0.04) AS abs_dev,
         CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
         CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
         (round((l_extendedprice)*100)/100) AS price_r2,
         (round((pow(l_quantity, 2))*1000000)/1000000) AS qty_sq,
         (round((sqrt(l_extendedprice))*1000000)/1000000) AS price_sqrt,
         (round((ln(l_extendedprice))*1000000)/1000000) AS price_ln,
         (round((log10(l_extendedprice))*1000000)/1000000) AS price_log10,
         (round((exp(l_discount))*1000000)/1000000) AS disc_exp,
         CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign,
         greatest(l_quantity, 25.0) AS qty_hi,
         least(l_quantity, 25.0) AS qty_lo,
         l_orderkey % 7 AS key_mod7
         FROM lineitem
         ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F4
    // Higher-order array functions over the 64-dim embedding vectors —
    // the Spark-native path for vector math (SURVEY §2.7 array family;
    // the cosine/topk path builds on the same primitives in §2.9 L3).
    QueryDef("f4_array_funcs", (s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        expr("round((aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE)))*10000)/10000").as("sum_all"),
        expr("round((sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))*10000)/10000").as("l2_norm"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        array_max(col("embedding")).as("max_val"),
        // slice(array_sort(...)) still exercises the array path, but the 3
        // smallest values are emitted as scalar double columns: the compare
        // harness cannot hash array cells, and float->string formatting
        // differs across engines so a joined string would be unstable.
        element_at(array_sort(col("embedding")), 1).cast("double").as("smallest1"),
        element_at(array_sort(col("embedding")), 2).cast("double").as("smallest2"),
        element_at(array_sort(col("embedding")), 3).cast("double").as("smallest3"))
        .orderBy(col("vec_id").asc_nulls_last)
    }, Some(
      """SELECT vec_id,
         CAST(len(embedding) AS INTEGER) AS dim,
         embedding[1] AS first_val,
         (round((list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'))*10000)/10000) AS sum_all,
         (round((sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))*10000)/10000) AS l2_norm,
         CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
         list_aggregate(embedding, 'max') AS max_val,
         CAST((list_sort(embedding))[1] AS DOUBLE) AS smallest1,
         CAST((list_sort(embedding))[2] AS DOUBLE) AS smallest2,
         CAST((list_sort(embedding))[3] AS DOUBLE) AS smallest3
         FROM embeddings ORDER BY vec_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F5
    // Struct pack/extract + map build/extract. The oracle states the
    // equivalent flat result (struct round-trip is the identity on values).
    QueryDef("f5_struct_map", (s, dir) => {
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("s"),
          map(lit("nk"), col("n_nationkey")).as("m"))
      n.select(
        col("n_nationkey"),
        col("s.name").as("s_name"),
        col("s.rk").as("s_rk"),
        element_at(col("m"), "nk").as("from_map"))
        .orderBy(col("n_nationkey").asc_nulls_last)
    }, Some(
      """SELECT n_nationkey,
         (struct_pack(name := n_name, rk := n_regionkey)).name AS s_name,
         (struct_pack(name := n_name, rk := n_regionkey)).rk AS s_rk,
         n_nationkey AS from_map
         FROM nation ORDER BY n_nationkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F6
    // JSON extraction from events.props ('{"k": 87}') — both the
    // path-extraction form (get_json_object) and the schema-projection
    // form (from_json → struct field).
    QueryDef("f6_json_funcs", (s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_struct"))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      """SELECT event_id,
         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_path,
         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_struct
         FROM events ORDER BY event_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F7
    // Hash functions: md5 is engine-portable (oracle-checked); xxhash64 /
    // uuid are engine-specific and exercised in the scalatest suite only.
    QueryDef("f7_hash_funcs", (s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        md5(concat(col("c_name"), lit("|"), col("c_mktsegment")).cast("binary")).as("combo_md5"))
        .orderBy(col("c_custkey").asc_nulls_last)
    }, Some(
      """SELECT c_custkey,
         md5(c_name) AS name_md5,
         md5(c_name || '|' || c_mktsegment) AS combo_md5
         FROM customer ORDER BY c_custkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- F8
    // explode = the table-function/unnest surface (§2.10 UDTF analogue).
    // Scale: explode is pipelined inside codegen (no shuffle); the groupBy
    // shuffles only distinct words.
    QueryDef("f8_explode", (s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc_nulls_last, col("word").asc_nulls_last)
        .limit(50)
    }, Some(
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word
         ORDER BY n DESC NULLS LAST, word ASC NULLS LAST
         LIMIT 50""")),

    // ------------------------------------------------------------------- F9
    // DECIMAL(p,s) arithmetic (SURVEY §1.2 type-system commitment): money
    // values as exact decimals — construct, multiply, subtract, SUM, round,
    // all in decimal space. The fixtures store doubles, and double→decimal
    // casts round differently across engines at representation boundaries
    // (HANDOFF rule 1), so the decimal is built from an integer cents value
    // both engines derive identically, via a formatted string (decimal
    // division is avoided: DuckDB's `/` leaves decimal space). From there
    // everything IS exact decimal math — multiply scales add (s=2+2→4),
    // SUM widens precision only, round() on decimals is exact half-up in
    // both engines (no float representation to disagree over). Outputs are
    // emitted as canonical decimal strings, which also proves scale
    // handling ("5.00", not "5.0").
    QueryDef.sql("f9_decimal",
      spark =
        """WITH cents AS (
             SELECT l_returnflag,
                    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
                    CAST(round(l_discount*100) AS BIGINT) AS disc_c
             FROM lineitem),
           dec AS (
             SELECT l_returnflag,
                    CAST(concat(CAST(price_c DIV 100 AS STRING), '.',
                                lpad(CAST(price_c % 100 AS STRING), 2, '0'))
                         AS DECIMAL(18,2)) AS price,
                    CAST(concat('0.', lpad(CAST(disc_c AS STRING), 2, '0'))
                         AS DECIMAL(4,2)) AS disc
             FROM cents)
           SELECT l_returnflag,
                  CAST(CAST(sum(price) AS DECIMAL(38,2)) AS STRING) AS gross,
                  CAST(CAST(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc))
                            AS DECIMAL(38,4)) AS STRING) AS net,
                  CAST(CAST(round(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc)), 1)
                            AS DECIMAL(38,1)) AS STRING) AS net_r1,
                  CAST(CAST(max(price) AS DECIMAL(18,2)) AS STRING) AS max_price,
                  count(*) AS n
           FROM dec GROUP BY l_returnflag
           ORDER BY l_returnflag ASC NULLS LAST""",
      oracle =
        """WITH cents AS (
             SELECT l_returnflag,
                    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
                    CAST(round(l_discount*100) AS BIGINT) AS disc_c
             FROM lineitem),
           dec AS (
             SELECT l_returnflag,
                    CAST(concat(CAST(price_c // 100 AS VARCHAR), '.',
                                lpad(CAST(price_c % 100 AS VARCHAR), 2, '0'))
                         AS DECIMAL(18,2)) AS price,
                    CAST(concat('0.', lpad(CAST(disc_c AS VARCHAR), 2, '0'))
                         AS DECIMAL(4,2)) AS disc
             FROM cents)
           SELECT l_returnflag,
                  CAST(CAST(sum(price) AS DECIMAL(38,2)) AS VARCHAR) AS gross,
                  CAST(CAST(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc))
                            AS DECIMAL(38,4)) AS VARCHAR) AS net,
                  CAST(CAST(round(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc)), 1)
                            AS DECIMAL(38,1)) AS VARCHAR) AS net_r1,
                  CAST(CAST(max(price) AS DECIMAL(18,2)) AS VARCHAR) AS max_price,
                  count(*) AS n
           FROM dec GROUP BY l_returnflag
           ORDER BY l_returnflag ASC NULLS LAST"""),

    // ----------------------------------------------------------------- F10
    // Spark 4 VariantType (SURVEY §1.2 JSON row): parse the JSON props
    // column ONCE into a variant (binary-encoded, schema-on-read) and
    // extract typed fields with variant_get — the engine-native
    // replacement for repeated get_json_object string parses on semi-
    // structured data. At 100 TB the parse cost is paid once per row and
    // extraction is a binary offset lookup, not a string scan. Oracle:
    // DuckDB regexp extraction of the same field (its json extension is
    // off-limits per parity rules).
    QueryDef("f10_variant", (s, dir) => {
      t(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
                min(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS min_k,
                max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS max_k
         FROM events GROUP BY event_type
         ORDER BY event_type ASC NULLS LAST""")),

    // ----------------------------------------------------------------- F11
    // Error-safe scalar functions under ANSI mode: TRY_CAST of a
    // partially-malformed string column and try_divide by a sometimes-
    // zero denominator both yield NULL instead of failing the job — the
    // ANSI-robustness contract a pipeline needs at 100 TB, where some
    // malformed row always exists. The parsed value round-trips
    // value→string→double identically in both engines regardless of
    // their string renderings; DuckDB expresses try_divide as a CASE.
    QueryDef("f11_try_funcs", (s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        expr("""try_cast(CASE WHEN event_id % 3 = 0
                              THEN concat('x', CAST(value AS STRING))
                              ELSE CAST(value AS STRING) END AS DOUBLE)""")
          .as("parsed"),
        expr("try_divide(value, CAST(event_id % 5 AS DOUBLE))").as("ratio"))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      """SELECT event_id,
                TRY_CAST(CASE WHEN event_id % 3 = 0
                              THEN concat('x', CAST(value AS VARCHAR))
                              ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS parsed,
                CASE WHEN event_id % 5 = 0 THEN NULL
                     ELSE value / CAST(event_id % 5 AS DOUBLE) END AS ratio
         FROM events ORDER BY event_id ASC NULLS LAST""")),

    // ------------------------------------------------------- M1 (multimodal)
    // Multimodal columns (builder prompt / SURVEY §2.9): media carried as an
    // opaque binary column + typed metadata computed without decoding.
    // The decode/feature-extract stages live in graft.functions.Multimodal
    // (deterministic stub decoder — no image/audio libs in this container);
    // this query exercises the SQL-visible metadata path end-to-end.
    QueryDef("m1_multimodal_meta", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .select(
          col("doc_id"),
          length(col("media")).as("n_bytes"),
          ascii(substring(col("media").cast("string"), 1, 1)).as("b1"),
          ascii(substring(col("media").cast("string"), 2, 1)).as("b2"),
          ascii(substring(col("media").cast("string"), 3, 1)).as("b3"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         ascii(substr(text, 1, 1)) AS b1,
         ascii(substr(text, 2, 1)) AS b2,
         ascii(substr(text, 3, 1)) AS b3
         FROM documents ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------- M2 (multimodal)
    // Frame sampling over an opaque "video" payload (builder prompt:
    // decode / frame-sample as partition-local stages): every 2nd
    // 64-byte window of the binary column becomes a frame row via the
    // typed-Dataset flatMap in Multimodal.sampleFrames — the real
    // batch-shape plumbing (map-only, no shuffle until the output sort).
    // The stub FEATURES are dropped here so the frame geometry itself
    // (index, byte count) sits under the hard oracle; the feature path
    // is covered by MedallionSpec's stub-decode test.
    QueryDef("m2_frame_sample", (s, dir) => {
      implicit val sp: SparkSession = s
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
      graft.functions.Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
        .select(col("id"), col("frame_idx"), col("frame_bytes"))
        .orderBy(col("id").asc_nulls_last, col("frame_idx").asc_nulls_last)
    }, Some(
      """SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
                CAST(least(64, octet_length(encode(text)) - i * 64) AS INTEGER)
                  AS frame_bytes
         FROM (SELECT doc_id, text,
                      unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0)
                                           AS BIGINT))) AS i
               FROM documents)
         WHERE i % 2 = 0
         ORDER BY id ASC NULLS LAST, frame_idx ASC NULLS LAST""")),

    // ------------------------------------------------------- M3 (multimodal)
    // Audio windowing over an opaque "PCM" payload: 256-byte frames every
    // 128 bytes (overlapping window/hop — the STFT framing every audio
    // featurizer uses) via the typed flatMap in Multimodal.windowAudio.
    // The stub per-window energy is dropped here so the window GEOMETRY
    // (index, byte count, overlap arithmetic) sits under the hard oracle;
    // the energy path is covered by FunctionsSpec's exact-bytes test.
    QueryDef("m3_audio_windows", (s, dir) => {
      implicit val sp: SparkSession = s
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
      graft.functions.Multimodal.windowAudio(media, frameBytes = 256, hopBytes = 128)
        .select(col("id"), col("win_idx"), col("win_bytes"))
        .orderBy(col("id").asc_nulls_last, col("win_idx").asc_nulls_last)
    }, Some(
      """SELECT doc_id AS id, CAST(i AS INTEGER) AS win_idx,
                CAST(least(256, octet_length(encode(text)) - i * 128) AS INTEGER)
                  AS win_bytes
         FROM (SELECT doc_id, text,
                      unnest(range(0, CAST(ceil(octet_length(encode(text)) / 128.0)
                                           AS BIGINT))) AS i
               FROM documents)
         ORDER BY id ASC NULLS LAST, win_idx ASC NULLS LAST""")),

    // ------------------------------------------------------- M4 (multimodal)
    // ViT patch-grid geometry: image dimensions ride typed metadata next
    // to the opaque payload (derived deterministically from the byte
    // length here — the decode that would read them from headers is the
    // documented stub boundary), and the patch tiling every vision
    // transformer performs — ceil-divided grid, right/bottom padding,
    // CLS-token sequence length — is exact integer arithmetic computed
    // WITHOUT decoding a pixel: map-only over the corpus at any scale.
    QueryDef("m4_patch_grid", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).as("n_bytes"))
        .withColumn("w", expr("CAST(64 + n_bytes % 100 AS INT)"))
        .withColumn("h", expr("CAST(48 + n_bytes % 77 AS INT)"))
        .select(col("doc_id"), col("w"), col("h"),
          expr("CAST((w + 15) div 16 AS INT)").as("patches_x"),
          expr("CAST((h + 15) div 16 AS INT)").as("patches_y"),
          expr("CAST(((w + 15) div 16) * 16 - w AS INT)").as("pad_x"),
          expr("CAST(((h + 15) div 16) * 16 - h AS INT)").as("pad_y"),
          expr("CAST(((w + 15) div 16) * ((h + 15) div 16) + 1 AS INT)")
            .as("seq_len"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH m AS (
           SELECT doc_id,
                  CAST(64 + octet_length(encode(text)) % 100 AS INTEGER) AS w,
                  CAST(48 + octet_length(encode(text)) % 77 AS INTEGER) AS h
           FROM documents)
         SELECT doc_id, w, h,
                CAST((w + 15) // 16 AS INTEGER) AS patches_x,
                CAST((h + 15) // 16 AS INTEGER) AS patches_y,
                CAST(((w + 15) // 16) * 16 - w AS INTEGER) AS pad_x,
                CAST(((h + 15) // 16) * 16 - h AS INTEGER) AS pad_y,
                CAST(((w + 15) // 16) * ((h + 15) // 16) + 1 AS INTEGER)
                  AS seq_len
         FROM m ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------- M5 (multimodal)
    // Perceptual-hash near-dup detection — the IMAGE twin of l2's text
    // dedup family: dHash 64-bit fingerprints (functions/Multimodal
    // .perceptualHashes — grid derivation is the documented stub
    // boundary, the dHash fold is the real published algorithm), then
    // banded Hamming LSH exactly like l2_minhash_lsh: the corpus
    // collapses to the DISTINCT hash domain, each hash explodes into 4
    // sixteen-bit bands, candidates are band-equality joins (never
    // all-pairs), and the verify stage is codegen xor + bit_count ≤ 6.
    // Census row: distinct hashes, exact dups (identical fingerprints),
    // candidate pairs, verified near-dups, Hamming range. Rows-only
    // (hash derivation is stub-internal); the banded-join shape is the
    // tested contract at 100 TB — swap the grid for a real resampler
    // and nothing downstream changes.
    QueryDef("m5_perceptual_dedup", (s, dir) => {
      implicit val sp: SparkSession = s
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
      val ph = graft.functions.Multimodal.perceptualHashes(media)
      val dom = ph.groupBy(col("phash")).agg(count(lit(1)).as("n_imgs"))
        .localCheckpoint(false)
      val bands = dom.select(col("phash"), explode(expr(
        """transform(sequence(0, 3),
           k -> named_struct('k', k,
                'v', shiftright(phash, CAST(k * 16 AS INT)) & 65535L))"""))
        .as("b"))
        .select(col("phash"), col("b.k").as("k"), col("b.v").as("v"))
      val cand = bands.alias("x").join(bands.alias("y"),
          col("x.k") === col("y.k") && col("x.v") === col("y.v") &&
          col("x.phash") < col("y.phash"))
        .select(col("x.phash").as("pa"), col("y.phash").as("pb"))
        .distinct()
      val exactDups = dom.filter(col("n_imgs") > 1)
        .agg(coalesce(sum(col("n_imgs") - 1), lit(0L)).as("n_exact_dups"))
      cand.withColumn("ham", expr("bit_count(pa ^ pb)"))
        .agg(count(lit(1)).as("n_candidate_pairs"),
          sum(when(col("ham") <= 6, 1L).otherwise(0L)).as("n_near_dup_pairs"),
          min(col("ham")).as("min_ham"), max(col("ham")).as("max_ham"))
        .crossJoin(broadcast(exactDups))
        .crossJoin(broadcast(dom.agg(count(lit(1)).as("n_distinct_hashes"))))
    }, None),

    // ------------------------------------------------------------------ F12
    // Bitwise scalars (&, <<, >>, bit_count) and bitwise aggregates
    // (bit_and/bit_or/bit_xor) — all codegen'd column expressions; the
    // aggregate trio is partial+final mergeable like any hash agg. DuckDB
    // widens sum() to HUGEINT and bit_count to TINYINT — oracle casts down.
    QueryDef("f12_bitwise", (s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
          shiftleft(col("o_orderkey"), 2).as("k_shl"),
          shiftright(col("o_orderkey"), 3).as("k_shr"),
          bit_count(col("o_orderkey")).as("k_bits"))
        .groupBy(col("o_orderstatus"))
        .agg(bit_and(col("k_and")).as("agg_and"),
          bit_or(col("k_and")).as("agg_or"),
          bit_xor(col("k_and")).as("agg_xor"),
          sum(col("k_bits")).as("sum_bits"),
          sum(col("k_shl")).as("sum_shl"),
          sum(col("k_shr")).as("sum_shr"))
        .orderBy(col("o_orderstatus").asc_nulls_last)
    }, Some(
      """SELECT o_orderstatus,
                bit_and(o_orderkey & 255) AS agg_and,
                bit_or(o_orderkey & 255) AS agg_or,
                bit_xor(o_orderkey & 255) AS agg_xor,
                CAST(sum(CAST(bit_count(o_orderkey) AS INTEGER)) AS BIGINT) AS sum_bits,
                CAST(sum(o_orderkey << 2) AS BIGINT) AS sum_shl,
                CAST(sum(o_orderkey >> 3) AS BIGINT) AS sum_shr
         FROM orders GROUP BY o_orderstatus
         ORDER BY o_orderstatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------ F14
    // Fuzzy string matching: jaro_winkler (graft.functions.
    // JaroWinklerSimilarity — a codegen Catalyst expression with
    // DuckDB-parity byte-level semantics, fuzz-pinned in FunctionsSpec)
    // driving a BLOCKED fuzzy self-join: candidate pairs come from a
    // (brand, size) equality join, the similarity kernel only scores
    // within blocks. That is the 100-TB shape for fuzzy dedup/record
    // linkage — an unblocked fuzzy join is O(n²) and banned; blocking
    // keys make it one hash shuffle plus per-block quadratic work bounded
    // by the largest block. The threshold compares ROUNDED values so an
    // engine ulp at the cut line cannot flip membership.
    QueryDef("f14_jaro_winkler", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val p = t(s, dir, "part")
      val a = p.select(col("p_brand").as("brand"), col("p_size").as("size"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("brand"), col("p_size").as("size"),
        col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("brand", "size"))
        .where(col("key_a") < col("key_b"))
        .withColumn("sim",
          expr("round(jaro_winkler(name_a, name_b) * 1000000) / 1000000"))
        .where(col("sim") >= 0.5)
        .select(col("brand"), col("size"), col("key_a"), col("key_b"), col("sim"))
        .orderBy(col("brand").asc_nulls_last, col("size").asc_nulls_last,
          col("key_a").asc_nulls_last, col("key_b").asc_nulls_last)
    }, Some(
      """SELECT a.p_brand AS brand, a.p_size AS size,
                a.p_partkey AS key_a, b.p_partkey AS key_b,
                round(jaro_winkler_similarity(a.p_name, b.p_name)*1000000)/1000000 AS sim
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_size = b.p_size
          AND a.p_partkey < b.p_partkey
         WHERE round(jaro_winkler_similarity(a.p_name, b.p_name)*1000000)/1000000 >= 0.5
         ORDER BY brand ASC NULLS LAST, size ASC NULLS LAST,
                  key_a ASC NULLS LAST, key_b ASC NULLS LAST""")),

    // ------------------------------------------------------------------ F15
    // SQL-defined functions — the dbt-macro / DuckDB CREATE MACRO
    // surface: a reusable business metric (scalar SQL UDF, BIGINT-cents
    // exact) and a parameterized relation (SQL table function), both
    // declared in SQL and INLINED by Catalyst into the calling plan —
    // codegen sees the expanded expression, so unlike a JVM closure UDF
    // there is zero black-box penalty and predicates/pruning still flow
    // through the table function's body. Oracle = the macro-expanded
    // query verbatim (DuckDB expands its macros the same way).
    QueryDef("f15_sql_macro", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
                 p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT
               RETURN CAST(round(p * (1 - d) * (1 + t) * 100) AS BIGINT)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION prio_orders(pfx STRING)
               RETURNS TABLE (ok BIGINT, prio STRING)
               RETURN SELECT o_orderkey, o_orderpriority FROM orders
               WHERE o_orderpriority < pfx""")
      s.sql("""SELECT prio, count(*) AS n_lines,
                      sum(net_cents(l_extendedprice, l_discount, l_tax))
                        AS net_cents
               FROM prio_orders('3') u
               JOIN lineitem ON l_orderkey = u.ok
               GROUP BY prio
               ORDER BY prio ASC NULLS LAST""")
    }, Some(
      """SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                  * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS net_cents
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderpriority < '3'
         GROUP BY 1
         ORDER BY prio ASC NULLS LAST""")),

    // ------------------------------------------------------------------ F16
    // PHONETIC BLOCKING for record linkage — soundex_code (custom
    // codegen Catalyst expression, NARA-spec American Soundex incl. the
    // H/W merge rule) as the COARSE blocking key, jaro_winkler (f14) as
    // the FINE score inside blocks: candidate pairs come from an
    // EQUALITY join on equal phonetic codes, never an all-pairs fuzzy
    // scan — the same candidates-then-verify discipline as every dedup
    // path here, which is what keeps name matching feasible at 100 TB
    // (blocks are ~surname-cardinality buckets). Rows-only: DuckDB
    // ships no soundex; FunctionsSpec pins the classic NARA vectors
    // (Robert/Ashcraft/Tymczak/Pfister/...) and the null contract.
    QueryDef("f16_phonetic_blocking", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // linkage runs over the DISTINCT key domain, not row instances:
      // the corpus collapses to (name, count) first — at 100 TB the
      // fuzzy compute is O(distinct names²/blocks) while row volume
      // only feeds the one keyed count (the l4_bpe_train vocab move)
      val names = t(s, dir, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
        .withColumn("sdx", expr("soundex_code(split(p_name, ' ')[0])"))
      val a = names.select(col("p_name").as("na"), col("n_rows").as("ca"),
        col("sdx"))
      val b = names.select(col("p_name").as("nb"), col("n_rows").as("cb"),
        col("sdx").as("sdxb"))
      a.join(b, col("sdx") === col("sdxb") && col("na") < col("nb"))
        .withColumn("jw", expr("round(jaro_winkler(na, nb) * 10000) / 10000"))
        .filter(col("jw") >= 0.85)
        .select(col("na"), col("nb"), col("sdx"), col("jw"),
          (col("ca") * col("cb")).as("pair_rows"))
        .orderBy(col("jw").desc, col("na").asc, col("nb").asc)
        .limit(20)
    }, None),

    // ------------------------------------------------------------------ F17
    // NYSIIS phonetic blocking (functions/Nysiis codegen expression) —
    // the FINER blocking key next to f16's soundex, and the census that
    // justifies choosing between them: over the soundex candidate pairs
    // (the coarser blocks), how many survive NYSIIS's finer key
    // (precision gained = pairs dropped), and how many VERIFIED matches
    // (jaro-winkler ≥ 0.85) each keeps (recall kept vs lost). One row
    // of exact counts — the blocking-key A/B every linkage pipeline
    // runs before committing 100 TB to one key. Same scale discipline
    // as f16: the corpus collapses to the DISTINCT name-head domain
    // first, candidate generation is equality-join only. Rows-only
    // (DuckDB has no NYSIIS); FunctionsSpec pins the Taft vectors and
    // codegen≡interpreted parity.
    // ------------------------------------------------------------------ F18
    // Metaphone phonetic blocking (functions/Metaphone codegen
    // expression) — the three-key blocking A/B/C census: over the
    // soundex candidate pairs (the coarsest blocks), how many survive
    // the NYSIIS key vs the Metaphone key, and how many jaro-verified
    // matches each keeps — the complete evidence a linkage pipeline
    // needs to pick its blocking key before committing 100 TB to one.
    // Same scale discipline as f16/f17: DISTINCT name-head domain
    // first, equality-join candidates only. Rows-only (DuckDB has
    // neither function); FunctionsSpec pins the spec vectors +
    // codegen≡interpreted parity.
    QueryDef("f18_metaphone_blocking", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val names = t(s, dir, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
        .withColumn("head", expr("split(p_name, ' ')[0]"))
        .withColumn("sdx", expr("soundex_code(head)"))
        .withColumn("nys", expr("nysiis_code(head)"))
        .withColumn("mtp", expr("metaphone_code(head)"))
      val a = names.select(col("p_name").as("na"), col("sdx"),
        col("nys"), col("mtp"))
      val b = names.select(col("p_name").as("nb"), col("sdx").as("sdxb"),
        col("nys").as("nysb"), col("mtp").as("mtpb"))
      a.join(b, col("sdx") === col("sdxb") && col("na") < col("nb"))
        .withColumn("same_nys", (col("nys") === col("nysb")).cast("int"))
        .withColumn("same_mtp", (col("mtp") === col("mtpb")).cast("int"))
        .withColumn("jw", expr("round(jaro_winkler(na, nb) * 10000) / 10000"))
        .agg(count(lit(1)).as("n_soundex_pairs"),
          sum(col("same_nys").cast("long")).as("n_nysiis_pairs"),
          sum(col("same_mtp").cast("long")).as("n_metaphone_pairs"),
          sum(when(col("jw") >= lit(0.85) && col("same_mtp") === 1, 1L)
            .otherwise(0L)).as("n_hits_kept_mtp"),
          sum(when(col("jw") >= lit(0.85) && col("same_mtp") === 0, 1L)
            .otherwise(0L)).as("n_hits_lost_mtp"))
    }, None),

    // ------------------------------------------------------------------ F19
    // Double Metaphone blocking census: the PRIMARY/ALTERNATE key pair
    // blocks on "any key matches" (Germanic/Slavic/Romance readings of
    // the same spelling), the property the single-key family can't
    // express — SCHMIDT(XMT/SMT) blocks with SMITH(SM0/XMT) through the
    // cross pairing. Same shape as f16–f18: soundex-pair candidates
    // over the DISTINCT name domain (the fixture's 64-name domain —
    // never the row count), dmetaphone either-key survivors, jaro-
    // verified hits kept/lost. Blocking stays an equality join at any
    // corpus size. Rows-only (DuckDB ships no dmetaphone; the key
    // vectors are pinned in FunctionsSpec).
    QueryDef("f19_dmetaphone_blocking", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val names = t(s, dir, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
        .withColumn("head", expr("split(p_name, ' ')[0]"))
        .withColumn("sdx", expr("soundex_code(head)"))
        .withColumn("dmp", expr("dmetaphone_code(head)"))
        .withColumn("dma", expr("dmetaphone_alt(head)"))
      val a = names.select(col("p_name").as("na"), col("sdx"),
        col("dmp"), col("dma"))
      val b = names.select(col("p_name").as("nb"), col("sdx").as("sdxb"),
        col("dmp").as("dmpb"), col("dma").as("dmab"))
      a.join(b, col("sdx") === col("sdxb") && col("na") < col("nb"))
        .withColumn("same_pri", (col("dmp") === col("dmpb")).cast("int"))
        .withColumn("either", (col("dmp") === col("dmpb") ||
          col("dmp") === col("dmab") || col("dma") === col("dmpb") ||
          col("dma") === col("dmab")).cast("int"))
        .withColumn("jw", expr("round(jaro_winkler(na, nb) * 10000) / 10000"))
        .agg(count(lit(1)).as("n_soundex_pairs"),
          sum(col("same_pri").cast("long")).as("n_primary_pairs"),
          sum(col("either").cast("long")).as("n_either_pairs"),
          sum(when(col("jw") >= lit(0.85) && col("either") === 1, 1L)
            .otherwise(0L)).as("n_hits_kept"),
          sum(when(col("jw") >= lit(0.85) && col("either") === 0, 1L)
            .otherwise(0L)).as("n_hits_lost"))
    }, None),

    QueryDef("f17_nysiis_blocking", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val names = t(s, dir, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
        .withColumn("head", expr("split(p_name, ' ')[0]"))
        .withColumn("sdx", expr("soundex_code(head)"))
        .withColumn("nys", expr("nysiis_code(head)"))
      val a = names.select(col("p_name").as("na"), col("sdx"), col("nys"))
      val b = names.select(col("p_name").as("nb"), col("sdx").as("sdxb"),
        col("nys").as("nysb"))
      a.join(b, col("sdx") === col("sdxb") && col("na") < col("nb"))
        .withColumn("same_nys", (col("nys") === col("nysb")).cast("int"))
        .withColumn("jw", expr("round(jaro_winkler(na, nb) * 10000) / 10000"))
        .agg(count(lit(1)).as("n_soundex_pairs"),
          sum(col("same_nys").cast("long")).as("n_nysiis_pairs"),
          sum(when(col("jw") >= lit(0.85) && col("same_nys") === 1, 1L)
            .otherwise(0L)).as("n_hits_kept"),
          sum(when(col("jw") >= lit(0.85) && col("same_nys") === 0, 1L)
            .otherwise(0L)).as("n_hits_lost"))
    }, None)
  )
}
