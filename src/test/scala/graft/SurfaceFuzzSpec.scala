package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.geom._
import graft.table.GeoTable

/** Round-14 fuzz families for the TEXT/QUERY surfaces the binary codec
  * suite (CodecFuzzSpec) skipped: WKT edge GRAMMAR (not just byte
  * mutations of valid strings), the `filterWhere` blocklist under
  * bypass attempts, and the CLI dispatch surface under assembled-argv
  * fuzz. Contract throughout: loud error (Exception / None from Opt
  * forms) or a valid result — never an Error, never a hang, never
  * silent acceptance of a blocked construct.
  */
class SurfaceFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // certification-run convention shared with CodecFuzzSpec: set
  // GRAFT_FUZZ_ITERS for the long run (the 10k-case bar)
  private val iters =
    sys.env.get("GRAFT_FUZZ_ITERS").map(_.toInt).getOrElse(2000)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sfuzz_$name").toString

  // ---- WKT grammar edges ---------------------------------------------------

  test("WKT grammar: scientific notation, signs, bare-dot decimals, " +
      "case-insensitive tags parse to the right coordinates") {
    def p(s: String): Geom = Wkt.parse(s)
    assert(p("POINT(1e5 2E-3)") == Point(100000.0, 0.002))
    assert(p("POINT (+1.5 -.5)") == Point(1.5, -0.5))
    assert(p("point zm (1 2 3 4)") == Point(1.0, 2.0))
    assert(p("  Point\t(7\n8)  ") == Point(7.0, 8.0))
    assert(p("POINT(-1.25e+2 .5)") == Point(-125.0, 0.5))
    // Z/M ordinates are consumed and projected away at every nesting
    assert(p("LINESTRING Z (0 0 9, 1 1 9)") ==
      LineString(CoordSeq(Array(0.0, 1.0), Array(0.0, 1.0))))
  }

  test("WKT grammar: EMPTY variants and mixed-dimension collections") {
    assert(Wkt.parse("POINT EMPTY").isEmpty)
    assert(Wkt.parse("MULTIPOLYGON EMPTY") == MultiPolygon(Array.empty))
    val gc = Wkt.parse(
      "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)")
      .asInstanceOf[GeometryCollection]
    assert(gc.geoms.length == 3 && gc.geoms.forall(_.isEmpty))
    // a Z member must not leak its dimension into an untagged sibling
    val mixed = Wkt.parse(
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 3), POINT (4 5))")
      .asInstanceOf[GeometryCollection]
    assert(mixed.geoms.toSeq == Seq(Point(1, 2), Point(4, 5)))
    // nested collections with alternating tags
    val nested = Wkt.parse(
      "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION M (POINT M (1 2 7)), POINT (3 4))")
      .asInstanceOf[GeometryCollection]
    assert(nested.geoms.length == 2)
  }

  test("WKT grammar: malformed edges reject loudly, parseOpt returns None") {
    val bad = Seq(
      "", "EMPTY", "POINT", "POINT ()", "POINT (1)", "POINT (1 2",
      "POINT (1 2) junk", "POINT (1e 2)", "POINT (..5 3)",
      "POINT (1 2,)", "LINESTRING ()", "LINESTRING (1 1,)",
      "POLYGON (1 1, 2 2)", "MULTIPOINT", "POINT ZM (1 2 3)",
      "POINT Z (1 2)", "GEOMETRYCOLLECTION (POINT (1 2)",
      "GEOMETRYCOLLECTION (,)", "POINT (NaN NaN)XX",
      "POINT(1 2)POINT(3 4)", "POINT EMPTY (1 2)")
    bad.foreach { s =>
      assert(Wkt.parseOpt(s).isEmpty, s"should reject: '$s'")
      intercept[Exception](Wkt.parse(s))
    }
  }

  test("WKT grammar fuzz: assembled near-valid strings — parseOpt never " +
      "throws, accepted strings round-trip idempotently") {
    val r = new scala.util.Random(1408L)
    val tokens = Array("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
      "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION", "EMPTY",
      "Z", "M", "ZM", "(", ")", ",", " ", "1", "-2.5", "1e3", ".5",
      "+0", "3.14159", "-1E-2", "\t", "\n")
    (1 to 2 * iters).foreach { i =>
      val n = 1 + r.nextInt(24)
      val s = Seq.fill(n)(tokens(r.nextInt(tokens.length))).mkString(" ")
      val opt =
        try Wkt.parseOpt(s)
        catch { case t: Throwable =>
          fail(s"case $i: parseOpt threw ${t.getClass.getName} on '$s'")
        }
      opt.foreach { g =>
        // printer-parser idempotence on everything the grammar accepts
        val printed = Wkt.print(g)
        val back = Wkt.parseOpt(printed)
        assert(back.nonEmpty, s"case $i: print of '$s' unparseable: '$printed'")
        assert(java.util.Arrays.equals(Wkb.write(back.get), Wkb.write(g)),
          s"case $i: '$s' -> '$printed' not idempotent")
      }
    }
  }

  // ---- filterWhere blocklist ----------------------------------------------

  test("filterWhere: bypass attempts are refused loudly; nothing reaches " +
      "execution silently") {
    val dir = tmp("where")
    val df = spark.range(10).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("geometry", graft.functions.geo.st_point(col("id") * 1.0,
        col("id") * 1.0))
    GeoTable.fromDataFrame(df, "geometry").write(s"$dir/t.parquet")
    val t = GeoTable.read(spark, s"$dir/t.parquet")

    // legit predicates pass
    assert(t.filterWhere("id > 3 AND name LIKE 'n%'").count() == 6)

    // keyword blocklist, incl. keywords hidden in comments (conservative
    // refusal is the documented semantic) and across NEWLINES (the
    // pre-round-14 regex used dot-no-newline and a multi-line WHERE
    // could smuggle a keyword past it)
    val blocked = Seq(
      "drop table x", "id > 0 -- drop",
      "id > 0 /* create */", "id > 0\nAND delete = 1",
      "x = 1\ndrop", "ATTACH 'f'", "Pragma x",
      // Spark-specific escape hatches: JVM reflection from an expression
      "java_method('java.lang.System','getenv','PATH') is not null",
      "reflect('java.lang.System','getenv','PATH') = ''",
      "JAVA_METHOD('a','b') = 'c'")
    blocked.foreach { w =>
      intercept[IllegalArgumentException](t.filterWhere(w))
    }

    // unicode homoglyphs miss the blocklist BUT must still fail loudly
    // at the expression parser — never execute as something else
    intercept[Exception](t.filterWhere("drоp table x")) // Cyrillic о
    // string-fragment assembly is DATA, not SQL — concat of 'dr','op'
    // builds a VALUE inside a filter expression; an expression cannot
    // escalate it to a statement, so this must NOT be blocked
    // (false-positive bound on the conservative blocklist)
    assert(t.filterWhere("length(concat('dr', 'op table x')) > 0")
      .count() == 10)
  }

  test("filterWhere: AST allowlist rejects parseable escape hatches the " +
      "keyword regex can never enumerate") {
    val dir = tmp("where_ast")
    val df = spark.range(10).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("geometry", graft.functions.geo.st_point(col("id") * 1.0,
        col("id") * 1.0))
    GeoTable.fromDataFrame(df, "geometry").write(s"$dir/t.parquet")
    val t = GeoTable.read(spark, s"$dir/t.parquet")

    // every one of these parses as a valid Spark expression and contains
    // NO blocklisted keyword — only the AST gate stands between them and
    // execution
    val astBlocked = Seq(
      // JVM reflection (the round-14 regex additions, now structural)
      "reflect('java.lang.System','getenv','PATH') = ''",
      "java_method('java.lang.Runtime','getRuntime') is not null",
      // error-raising / assertion escape hatches
      "assert_true(id > 0) is null",
      "raise_error('x') is null",
      // session/environment probes
      "current_user() = 'root'",
      "input_file_name() != ''",
      "session_user() = 'root'",
      "version() != ''",
      // nondeterminism (harmless but outside the allowlist by design)
      "rand() > 0.5",
      "uuid() != ''",
      // higher-order functions (lambda machinery)
      "exists(array(1,2), x -> x > 1)",
      "aggregate(array(1,2), 0, (a, x) -> a + x) > 0",
      // subqueries
      "id IN (SELECT 1)",
      // aggregate-with-FILTER syntax
      "count(id) FILTER (WHERE id > 0) > 0",
      // multi-part (qualified) function names bypass single-name matching
      "builtin.concat('a','b') = 'ab'")
    astBlocked.foreach { w =>
      val e = intercept[IllegalArgumentException](t.filterWhere(w))
      assert(e.getMessage.contains("disallowed expression"),
        s"expected AST refusal for: $w, got: ${e.getMessage}")
    }

    // the allowlist is not a lockdown: realistic predicate shapes pass,
    // including the session-registered spatial surface
    assert(t.filterWhere("coalesce(length(name), 0) BETWEEN 1 AND 10 " +
      "AND id % 2 = 0").count() == 5)
    assert(t.filterWhere(
      "CASE WHEN id < 5 THEN 'lo' ELSE 'hi' END = 'lo'").count() == 5)
    assert(t.filterWhere("cast(id AS STRING) RLIKE '^[0-4]$'").count() == 5)
    assert(t.filterWhere("st_x(geometry) >= 6.0").count() == 4)
    assert(t.filterWhere("name IN ('n1','n2') OR id IS NULL").count() == 2)
    assert(t.filterWhere("abs(id - 9) <= 1 AND NOT isnull(name)")
      .count() == 2)
  }

  test("filterWhere AST gate fuzz: assembled allowed-grammar predicates " +
      "always pass; the same predicate with ONE forbidden call injected " +
      "anywhere always refuses") {
    val rnd = new scala.util.Random(20260816L)
    val spark2 = spark
    import graft.table.WhereGate
    val cols = Seq("id", "name", "price")
    val lits = Seq("1", "2.5", "'abc'", "NULL", "true")
    val fns1 = Seq("abs", "lower", "length", "sqrt", "reverse")
    val fns2 = Seq("pow", "nullif", "concat", "coalesce", "least")
    val cmps = Seq("=", "<", ">", "<=", ">=", "!=")
    // leaf → scalar → predicate grammar, all inside the allowlist
    def scalar(depth: Int): String =
      if (depth <= 0) (if (rnd.nextBoolean()) cols(rnd.nextInt(cols.size))
        else lits(rnd.nextInt(lits.size)))
      else rnd.nextInt(4) match {
        case 0 => s"${fns1(rnd.nextInt(fns1.size))}(${scalar(depth - 1)})"
        case 1 => s"${fns2(rnd.nextInt(fns2.size))}(${scalar(depth - 1)}, " +
          s"${scalar(depth - 1)})"
        case 2 => s"(${scalar(depth - 1)} + ${scalar(depth - 1)})"
        case _ => s"CASE WHEN ${pred(0)} THEN ${scalar(depth - 1)} " +
          s"ELSE ${scalar(depth - 1)} END"
      }
    def pred(depth: Int): String =
      if (depth <= 0)
        s"${scalar(1)} ${cmps(rnd.nextInt(cmps.size))} ${scalar(1)}"
      else rnd.nextInt(4) match {
        case 0 => s"(${pred(depth - 1)} AND ${pred(depth - 1)})"
        case 1 => s"(${pred(depth - 1)} OR ${pred(depth - 1)})"
        case 2 => s"NOT (${pred(depth - 1)})"
        case _ => s"${scalar(1)} IS NOT NULL"
      }
    val forbidden = Seq("reflect('a','b')", "java_method('a','b')",
      "raise_error('x')", "current_user()", "uuid()", "rand()",
      "input_file_name()", "assert_true(true)")
    var passed = 0
    var refused = 0
    for (_ <- 1 to math.max(200, iters / 10)) {
      val w = pred(2 + rnd.nextInt(2))
      // allowed grammar must validate (no false positives from the AST
      // walk itself; the keyword pre-check can't fire — grammar emits no
      // keywords)
      WhereGate.validate(spark2, w)
      passed += 1
      // inject one forbidden call as a comparison operand somewhere
      val f = forbidden(rnd.nextInt(forbidden.size))
      val poisoned = s"($w) AND $f IS NOT NULL"
      val e = intercept[IllegalArgumentException](
        WhereGate.validate(spark2, poisoned))
      assert(e.getMessage.contains("disallowed expression"), e.getMessage)
      refused += 1
    }
    assert(passed == refused && passed >= 200)
  }

  test("WHERE gate accepts the bare CURRENT_DATE/CURRENT_TIMESTAMP keyword " +
      "forms, not only the parenthesized calls") {
    import graft.table.WhereGate
    // Spark parses the keyword forms straight to CurrentDate/
    // CurrentTimestamp/Now nodes (not UnresolvedFunction), so they need
    // structural allowlist entries; both spellings are documented-allowed
    Seq("to_date('2026-01-01') <= current_date",
        "to_date('2026-01-01') <= current_date()",
        "to_timestamp('2026-01-01') < current_timestamp",
        "to_timestamp('2026-01-01') < current_timestamp()",
        "to_timestamp('2026-01-01') < now()")
      .foreach(w => WhereGate.validate(spark, w))
  }

  test("filterWhere: string literals containing keywords are data when " +
      "split, blocked when whole (conservative, documented)") {
    val dir = tmp("where2")
    val df = spark.range(4).toDF("id")
      .withColumn("name",
        when(col("id") === 0, lit("drop")).otherwise(lit("keep")))
      .withColumn("geometry",
        graft.functions.geo.st_point(col("id") * 1.0, lit(0.0)))
    GeoTable.fromDataFrame(df, "geometry").write(s"$dir/t.parquet")
    val t = GeoTable.read(spark, s"$dir/t.parquet")
    // the word "drop" ANYWHERE trips the blocklist — even as a literal;
    // that over-refusal is the reference's own semantic (pin it)
    intercept[IllegalArgumentException](t.filterWhere("name = 'drop'"))
    // the split form expresses the same query without the keyword
    assert(t.filterWhere("name = concat('dr', 'op')").count() == 1)
  }

  // ---- CLI dispatch fuzz ----------------------------------------------------

  test("CLI dispatch fuzz: assembled argv is loud-or-valid, never an " +
      "Error, never a hang") {
    val dir = tmp("cli")
    // tiny real fixture so commands that get past arg parsing do real,
    // fast work instead of failing only on missing inputs
    val csv = new StringBuilder("id,wkt\n")
    (0 until 20).foreach(i => csv.append(s"$i,POINT (${i % 9} ${i % 5})\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"), csv.toString)
    cli.Main.run(spark, Seq("convert", s"$dir/in.csv", s"$dir/t.parquet",
      "--wkt-column", "wkt"))

    val r = new scala.util.Random(2026L)
    val commands = Array("extract", "add", "sort", "reproject", "partition",
      "convert", "to", "inspect", "check", "set-version", "meta", "stats",
      "dedup", "split", "validate", "nonsense", "")
    val subs = Array("bbox", "quadkey", "kdtree", "h3", "hilbert", "column",
      "string", "admin", "country", "geojson", "csv", "gpkg", "shapefile",
      "all", "spatial", "bbox-metadata", "wat")
    val flags = Array("--bbox", "0,0,5,5", "--columns", "id", "--limit",
      "3", "--zoom", "4", "--resolution", "2", "--iterations", "2",
      "--precision", "3", "--wkt-column", "wkt", "--force", "--flat",
      "--where", "id > 1", "--target", "EPSG:3857", "--by", "id",
      "--not-a-flag", "--bbox", "garbage", "--zoom", "-1", "--limit", "x")
    val paths = Array(s"$dir/t.parquet", s"$dir/in.csv", s"$dir/missing",
      s"$dir/out_${r.nextInt(1 << 20)}", "/dev/null", "")
    (1 to math.max(150, iters / 13)).foreach { i =>
      val argv = scala.collection.mutable.ArrayBuffer[String]()
      argv += commands(r.nextInt(commands.length))
      if (r.nextBoolean()) argv += subs(r.nextInt(subs.length))
      argv += paths(r.nextInt(paths.length))
      argv += s"$dir/o$i"
      (0 until r.nextInt(4)).foreach(_ =>
        argv += flags(r.nextInt(flags.length)))
      try { cli.Main.run(spark, argv.toSeq); () }
      catch {
        case _: Exception => () // loud refusal is the contract
        case t: Throwable =>
          fail(s"case $i: argv=${argv.mkString(" ")} threw " +
            s"${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }
}
