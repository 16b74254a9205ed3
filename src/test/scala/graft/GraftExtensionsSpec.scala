package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL function registration via spark.sql.extensions. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("genomic functions are callable from SQL") {
    // extensions bind at session construction: tear down any shared
    // session first (SparkSuite rebuilds on demand)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT parse_region('chr1:10,001-20,000').chrom AS c,
          |       parse_region('chr1:10,001-20,000').start AS s,
          |       parse_region('chr1:[5,10)', '01').start AS s01,
          |       cigar_ref_len('8M2I4M1D3M') AS rl,
          |       size(cigar_ops('8M2I4M1D3M')) AS nops""".stripMargin)
        .collect()(0)
      assert(r.getString(0) == "chr1")
      assert(r.getLong(1) == 10000L)
      assert(r.getLong(2) == 5L)
      assert(r.getLong(3) == 16L)
      assert(r.getInt(4) == 5)
      // arity and literal-coords violations get clear analysis-time
      // errors, not NoSuchElementException / internal Catalyst crashes
      val eArity = intercept[Exception] {
        spark.sql("SELECT cigar_ref_len('4M', '2M')").collect()
      }
      assert(String.valueOf(eArity.getMessage).contains("1 argument") ||
        String.valueOf(eArity.getCause).contains("1 argument"))
      val eColumn = intercept[Exception] {
        spark.sql(
          "SELECT parse_region(r, c) FROM VALUES ('chr1:1-2', '01') t(r, c)")
          .collect()
      }
      assert(String.valueOf(eColumn.getMessage).contains("literal") ||
        String.valueOf(eColumn.getCause).contains("literal"))
      val eNull = intercept[Exception] {
        spark.sql(
          "SELECT parse_region('chr1:1-2', CAST(NULL AS STRING))").collect()
      }
      assert(String.valueOf(eNull.getMessage).contains("null") ||
        String.valueOf(eNull.getCause).contains("null"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("interval/as-of table functions build the Scala API's exact plan") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tvf-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      Seq(("chr1", 10L, 50L), ("chr1", 40L, 80L), ("chr2", 5L, 9L))
        .toDF("chrom", "start", "end").createOrReplaceTempView("ivs")
      Seq((1L, "chr1", 0L, 30L), (2L, "chr2", 100L, 120L))
        .toDF("aid", "chrom", "start", "end").createOrReplaceTempView("a")
      Seq((7L, "chr1", 20L, 60L))
        .toDF("bid", "chrom", "start", "end").createOrReplaceTempView("b")
      Seq((7L, "chr1", 20L, 60L, 3L))
        .toDF("bid", "chrom", "start", "end", "v")
        .createOrReplaceTempView("bv")
      Seq((7L, "chr1", 20L, 60L))
        .toDF("bid", "bchrom", "bstart", "bend")
        .createOrReplaceTempView("br")
      Seq(("chr1", 100L), ("chr2", 150L))
        .toDF("chrom", "size").createOrReplaceTempView("sz")
      Seq((1L, "chr1", 0L, 30L, "-"), (2L, "chr1", 80L, 85L, "+"))
        .toDF("aid", "chrom", "start", "end", "strand")
        .createOrReplaceTempView("ast")
      Seq((7L, "chr1", 20L, 60L, "+"), (8L, "chr1", 90L, 95L, "-"))
        .toDF("bid", "chrom", "start", "end", "strand")
        .createOrReplaceTempView("bst")
      Seq((1L, "chr1", 0L, 100L, Seq(0L, 60L), Seq(20L, 30L)))
        .toDF("aid", "chrom", "start", "end", "bst", "bsz")
        .createOrReplaceTempView("asp")
      // tiny FASTA + .fai for the sequence TVFs (covers ivs's coords)
      val seqDir = java.nio.file.Files.createTempDirectory("graft-tvf-fa")
      val c1 = "ACGT" * 30
      val c2 = "TTGG" * 10
      java.nio.file.Files.write(seqDir.resolve("r.fa"),
        (s">chr1\n$c1\n>chr2\n$c2\n").getBytes("UTF-8"))
      java.nio.file.Files.write(seqDir.resolve("r.fa.fai"),
        (s"chr1\t${c1.length}\t6\t${c1.length}\t${c1.length + 1}\n" +
          s"chr2\t${c2.length}\t${6 + c1.length + 1 + 6}\t" +
          s"${c2.length}\t${c2.length + 1}\n").getBytes("UTF-8"))
      val tvfFa = seqDir.resolve("r.fa").toString
      Seq(("chr1", 10L, 50L, "+", "n1"), ("chr1", 40L, 80L, "-", "n2"))
        .toDF("chrom", "start", "end", "strand", "name")
        .createOrReplaceTempView("ivss")
      Seq(("x", "chr1", 10L, 50L), ("y", "chr1", 40L, 80L))
        .toDF("set", "chrom", "start", "end")
        .createOrReplaceTempView("lab")
      Seq((1, "2024-01-02 00:00:00", "e1"))
        .toDF("uid", "ts", "eid")
        .withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast("timestamp"))
        .createOrReplaceTempView("clicks")
      Seq((1, "2024-01-01 00:00:00", 10))
        .toDF("ruid", "rts", "okey")
        .withColumn("rts", org.apache.spark.sql.functions.col("rts")
          .cast("timestamp"))
        .createOrReplaceTempView("views")

      import graft.operators.{AsofJoin, IntervalOps}
      // (sql text, equivalent Scala-API frame) pairs — the optimized
      // plans must CANONICALIZE identically (same operators, same
      // expressions, ids normalized), and the results must match
      val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "SELECT * FROM interval_merge('ivs')" ->
          IntervalOps.mergeIntervals(spark.table("ivs")),
        "SELECT * FROM interval_coverage('ivs')" ->
          IntervalOps.coverage(spark.table("ivs")),
        "SELECT * FROM interval_complement('ivs')" ->
          IntervalOps.complement(spark.table("ivs")),
        "SELECT * FROM interval_subtract('a', 'b', 'aid')" ->
          IntervalOps.subtract(spark.table("a"), spark.table("b"), "aid"),
        "SELECT * FROM interval_closest('a', 'b', 'aid', 'bid')" ->
          IntervalOps.closest(spark.table("a"), spark.table("b"),
            "aid", "bid"),
        "SELECT * FROM interval_closest_all('a', 'b', 'aid', 'bid')" ->
          IntervalOps.closestAll(spark.table("a"), spark.table("b"),
            "aid", "bid"),
        "SELECT * FROM interval_closest('ast', 'bst', 'aid', 'bid', " +
          "'io,D=a')" ->
          IntervalOps.closest(spark.table("ast"), spark.table("bst"),
            "aid", "bid", opts = graft.operators.ClosestOptions(
              signed = true, ignoreOverlaps = true,
              distanceMode = graft.operators.DistanceMode.RespectA())),
        "SELECT * FROM interval_closest_all('ast', 'bst', 'aid', " +
          "'bid', 'iu')" ->
          IntervalOps.closestAll(spark.table("ast"), spark.table("bst"),
            "aid", "bid", opts = graft.operators.ClosestOptions(
              signed = true, ignoreUpstream = true)),
        "SELECT * FROM interval_closest_k('a', 'b', 'aid', 'bid', 2)" ->
          IntervalOps.closestK(spark.table("a"), spark.table("b"),
            "aid", "bid", 2),
        "SELECT * FROM interval_closest_k('ast', 'bst', 'aid', 'bid', " +
          "2, 'id,D=b')" ->
          IntervalOps.closestK(spark.table("ast"), spark.table("bst"),
            "aid", "bid", 2, opts = graft.operators.ClosestOptions(
              signed = true, ignoreDownstream = true,
              distanceMode = graft.operators.DistanceMode.RespectB())),
        "SELECT * FROM interval_map('a', 'bv', 'aid', 'v')" ->
          IntervalOps.mapOverlaps(spark.table("a"), spark.table("bv"),
            "aid", "v"),
        "SELECT * FROM interval_map('asp', 'bv', 'aid', 'v', 'bst', " +
          "'bsz')" ->
          IntervalOps.mapOverlaps(spark.table("asp"), spark.table("bv"),
            "aid", "v", blockStarts = "bst", blockSizes = "bsz"),
        "SELECT * FROM interval_coverage_by('asp', 'b', 'aid', " +
          "'bst', 'bsz')" ->
          IntervalOps.coverageBy(spark.table("asp"), spark.table("b"),
            "aid", blockStarts = "bst", blockSizes = "bsz"),
        "SELECT * FROM interval_explode_blocks('asp', 'start', 'end', " +
          "'bst', 'bsz')" ->
          IntervalOps.explodeBlocks(spark.table("asp"),
            "start", "end", "bst", "bsz"),
        "SELECT * FROM interval_jaccard('a', 'b')" ->
          IntervalOps.jaccard(spark.table("a"), spark.table("b")),
        "SELECT * FROM interval_filter('a', 'b', 'aid', 'u')" ->
          IntervalOps.overlapFilter(spark.table("a"), spark.table("b"),
            "aid", keep = true),
        "SELECT * FROM interval_filter('a', 'b', 'aid', 'v')" ->
          IntervalOps.overlapFilter(spark.table("a"), spark.table("b"),
            "aid", keep = false),
        "SELECT * FROM interval_intersect('a', 'b', 'aid', 'bid')" ->
          IntervalOps.intersectJoin(spark.table("a"), spark.table("b"),
            "aid", "bid"),
        "SELECT * FROM interval_intersect('a', 'b', 'aid', 'bid', " +
          "'wao')" ->
          IntervalOps.intersectJoin(spark.table("a"), spark.table("b"),
            "aid", "bid", mode = "wao"),
        "SELECT * FROM interval_intersect('asp', 'b', 'aid', 'bid', " +
          "'wao', 'bst', 'bsz')" ->
          IntervalOps.intersectJoin(spark.table("asp"),
            spark.table("b"), "aid", "bid", mode = "wao",
            blockStarts = "bst", blockSizes = "bsz"),
        s"SELECT * FROM interval_getfasta('ivs', '$tvfFa')" ->
          graft.operators.SequenceOps.getFasta(spark.table("ivs"),
            tvfFa),
        s"SELECT * FROM interval_nuc('ivs', '$tvfFa')" ->
          graft.operators.SequenceOps.nucContent(spark.table("ivs"),
            tvfFa),
        (s"SELECT * FROM interval_getfasta('ivss', '$tvfFa', 'chrom', " +
          "'start', 'end', 'strand', 'name')") ->
          graft.operators.SequenceOps.getFasta(spark.table("ivss"),
            tvfFa, strand = "strand", name = "name"),
        "SELECT * FROM interval_slop('ivs', 15, 'sz')" ->
          IntervalOps.slop(spark.table("ivs"), both = 15L,
            chromSizes = Some(spark.table("sz"))),
        "SELECT * FROM interval_flank('ivs', 5, 7, 'sz')" ->
          IntervalOps.flank(spark.table("ivs"), left = 5L, right = 7L,
            chromSizes = Some(spark.table("sz"))),
        "SELECT * FROM interval_window('a', 'br', 30, 'bchrom', " +
          "'bstart', 'bend')" ->
          IntervalOps.windowJoin(spark.table("a"), spark.table("br"),
            window = 30L,
            rightCols = ("bchrom", "bstart", "bend")),
        "SELECT * FROM interval_coverage_by('a', 'b', 'aid')" ->
          IntervalOps.coverageBy(spark.table("a"), spark.table("b"),
            "aid"),
        "SELECT * FROM interval_cluster('ivs')" ->
          IntervalOps.cluster(spark.table("ivs")),
        "SELECT * FROM make_windows('sz', 40, 25)" ->
          IntervalOps.makeWindows(spark.table("sz"), windowSize = 40L,
            step = 25L),
        "SELECT * FROM interval_shift('ivs', -20, 'sz')" ->
          IntervalOps.shift(spark.table("ivs"), -20L,
            chromSizes = Some(spark.table("sz"))),
        "SELECT * FROM interval_multiinter('lab', 'set')" ->
          IntervalOps.multiinter(spark.table("lab"), setCol = "set"),
        "SELECT * FROM interval_reldist('a', 'b', 'aid')" ->
          IntervalOps.reldist(spark.table("a"), spark.table("b"),
            "aid"),
        "SELECT * FROM interval_shuffle('a', 'sz', 7, 'aid')" ->
          IntervalOps.shuffleIntervals(spark.table("a"),
            spark.table("sz"), seed = 7L, idCol = "aid"),
        "SELECT * FROM interval_annotate('a', 'aid', 'one', 'b', " +
          "'two', 'ivs')" ->
          IntervalOps.annotate(spark.table("a"),
            Seq("one" -> spark.table("b"), "two" -> spark.table("ivs")),
            "aid"),
        ("SELECT * FROM asof_backward('clicks', 'views', 'uid', 'ruid', " +
          "'ts', 'rts')") ->
          AsofJoin.backward(spark.table("clicks"), spark.table("views"),
            "uid", "ruid", "ts", "rts"),
        ("SELECT * FROM asof_forward('clicks', 'views', 'uid', 'ruid', " +
          "'ts', 'rts')") ->
          AsofJoin.forward(spark.table("clicks"), spark.table("views"),
            "uid", "ruid", "ts", "rts"))
      cases.foreach { case (sql, api) =>
        // ids are ALPHA-RENAMED by first appearance (`#12` -> `#a0`,
        // `[34]` -> `[a1]`, in scan order): two builds of the same
        // logical shape assign ids in the same positions, so the
        // rename removes the build-to-build flake the RDD-backed
        // operators showed — while, unlike the old collapse-to-one-
        // token scheme, a plan wiring a DIFFERENT attribute (same
        // shape, wrong binding) still compares unequal
        def planOf(df: org.apache.spark.sql.DataFrame): String = {
          val raw = df.queryExecution.optimizedPlan.canonicalized
            .toString
          val seen =
            scala.collection.mutable.LinkedHashMap.empty[String, String]
          "#\\d+|\\[\\d+\\]".r.replaceAllIn(raw, m => {
            val tok = m.matched
            java.util.regex.Matcher.quoteReplacement(
              seen.getOrElseUpdate(tok,
                if (tok.startsWith("#")) s"#a${seen.size}"
                else s"[a${seen.size}]"))
          })
        }
        val viaSql = spark.sql(sql)
        if (planOf(viaSql) != planOf(api)) {
          // one retry layer remains as a diagnostic net: if an
          // UN-normalized source of nondeterminism still exists, the
          // printed diff names the case for the round ledger; a REAL
          // plan drift differs on EVERY rebuild and still fails
          info(s"normalized plan mismatch on first build for: $sql\n" +
            s"--- sql-side ---\n${planOf(viaSql)}\n" +
            s"--- api-side ---\n${planOf(api)}")
          val rebuilds = Seq.fill(3)(planOf(spark.sql(sql)))
          assert(rebuilds.contains(planOf(api)),
            s"plan drift for: $sql")
        }
        assert(viaSql.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
          api.collect().map(_.toSeq).toSeq.sortBy(_.toString),
          s"result drift for: $sql")
      }
      // sanity on one result: the merge really merged
      assert(spark.sql("SELECT * FROM interval_merge('ivs')").count() == 2)
      // loud analysis-time errors for bad arity / non-literal args
      val eArity = intercept[Exception] {
        spark.sql("SELECT * FROM interval_merge('ivs', 'chrom')").collect()
      }
      assert(String.valueOf(eArity.getMessage).contains("interval_merge") ||
        String.valueOf(eArity.getCause).contains("interval_merge"))
      val eTbl = intercept[Exception] {
        spark.sql("SELECT * FROM interval_merge('no_such_table')").collect()
      }
      assert(eTbl != null)
      // fractional double literals must be rejected, not silently
      // truncated: 1.5e0 is a foldable Number whose longValue() is 1
      val eFrac = intercept[Exception] {
        spark.sql("SELECT * FROM interval_slop('ivs', 1.5e0)").collect()
      }
      assert(String.valueOf(eFrac.getMessage).contains("literal integer") ||
        String.valueOf(eFrac.getCause).contains("literal integer"))
      // integral double literals still pass (2e0 == growth 2)
      assert(spark.sql("SELECT * FROM interval_slop('ivs', 2e0)")
        .collect().nonEmpty)
      // a NONDETERMINISTIC input table is rejected at analysis time:
      // the eager two-pass operators freeze driver-side pass-A
      // summaries at construction, and a rand()-bearing child
      // recomputed under executor loss could disagree with them
      // (spark.range, not a local Seq: a Project-over-LocalRelation
      // with an evaluable rand() constant-folds into literal rows —
      // which IS deterministic-after-freezing and rightly passes)
      import org.apache.spark.sql.functions.{lit, rand}
      spark.range(5)
        .withColumn("chrom", lit("chr1"))
        .withColumn("start", (rand(7) * 100).cast("long"))
        .withColumn("end", org.apache.spark.sql.functions.col("start") + 10)
        .createOrReplaceTempView("nd")
      val eNd = intercept[Exception] {
        spark.sql("SELECT * FROM interval_merge('nd')").collect()
      }
      assert(
        String.valueOf(eNd.getMessage).contains("nondeterministic") ||
          String.valueOf(eNd.getCause).contains("nondeterministic"))
      // the documented remedy — cache + materialize — passes: the
      // frozen InMemoryRelation leaf hides the rand() derivation
      spark.table("nd").cache().count()
      try assert(spark.sql("SELECT * FROM interval_merge('nd')")
        .collect().nonEmpty)
      finally spark.table("nd").unpersist()
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("regions_overlap treats a null end as open-ended, not as no-match") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-overlap-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      import graft.functions.GenomicFunctions.regions_overlap
      // parse_region('chr1') / 'chr1:5000' emit end = NULL (open-ended);
      // under plain SQL comparison that NULL would make the predicate
      // NULL and drop every row — the helper must treat it as unbounded
      val df = Seq(
        ("chr1", 100L, Option(200L)),   // bounded, overlapping
        ("chr1", 5000L, None),          // open-ended from 5000
        ("chr2", 100L, Option(200L))    // wrong chromosome
      ).toDF("chrom", "start", "end")
      val hit = df.where(regions_overlap(
        col("chrom"), col("start"), col("end"),
        lit("chr1"), lit(0L), lit(10000L))).count()
      assert(hit == 2, s"bounded+open-ended on chr1 must both match: $hit")
      // open-ended QUERY side: whole-chromosome probe matches both
      // chr1 rows regardless of their coordinates
      val hitOpen = df.where(regions_overlap(
        col("chrom"), col("start"), col("end"),
        lit("chr1"), lit(0L), lit(null).cast("long"))).count()
      assert(hitOpen == 2, s"whole-chromosome probe must match: $hitOpen")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("genomic expressions run inside whole-stage codegen, no fallback") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import graft.functions.GenomicFunctions
    // the classes must not re-grow the interpreted escape hatch
    assert(!classOf[CodegenFallback]
      .isAssignableFrom(classOf[GenomicFunctions.ParseRegion]))
    assert(!classOf[CodegenFallback]
      .isAssignableFrom(classOf[GenomicFunctions.CigarRefLen]))
    assert(!classOf[CodegenFallback]
      .isAssignableFrom(classOf[GenomicFunctions.CigarOps]))
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // fallback=false: a doGenCode bug fails the test instead of silently
    // reverting to interpreted execution
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-codegen-test")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      // spark.range can't collapse to a LocalRelation, so the Project
      // really executes inside WholeStageCodegen
      val df = spark.range(3).select(
        GenomicFunctions.parse_region(concat(lit("chr1:"),
          (col("id") * 1000 + 1).cast("string"), lit("-"),
          ((col("id") + 1) * 1000).cast("string"))).as("r"),
        GenomicFunctions.cigar_ref_len(
          when(col("id") === 1, "*").otherwise(
            concat((col("id") + 1).cast("string"), lit("M2I3M")))).as("rl"),
        GenomicFunctions.cigar_ops(concat((col("id") + 1).cast("string"),
          lit("M2I3M"))).as("ops"))
      // the '*(n)' prefix is the whole-stage-codegen marker: the Project
      // holding all three expressions compiles into the generated stage
      assert(df.queryExecution.executedPlan.toString
        .contains("*(1) Project"), df.queryExecution.executedPlan)
      val rows = df.collect()
      assert(rows.map(_.getStruct(0).getLong(1)).toSeq ==
        Seq(0L, 1000L, 2000L)) // 1-based starts normalized to 0-based
      assert(rows.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ==
        Seq(4L, -1L, 6L)) // id M + 3M ref bases; '*' → null survives codegen
      assert(rows.map(_.getSeq[Any](2).size).toSeq == Seq(3, 3, 3))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("cigar expressions declare nullability and reject trailing counts") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-cigar-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // non-nullable input column (when/otherwise over literals): '*'
      // still evaluates to null, and the IS NULL filter must SURVIVE
      // optimization (without the nullable override the optimizer folds
      // IsNull(non-nullable) to false)
      val df = Seq(1, 2).toDF("i")
        .select(when(col("i") === 1, "3M").otherwise("*").as("c"))
      assert(!df.schema("c").nullable)
      val nulls = df
        .select(graft.functions.GenomicFunctions.cigar_ref_len(col("c"))
          .as("l"))
        .where(col("l").isNull).count()
      assert(nulls == 1L)
      // a trailing count is a truncated record, not clean data
      val e = intercept[Exception] {
        Seq("10M5").toDF("c")
          .select(graft.functions.GenomicFunctions.cigar_ref_len(col("c")))
          .collect()
      }
      assert(String.valueOf(e.getMessage) .contains("bad CIGAR") ||
        String.valueOf(e.getCause).contains("bad CIGAR"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
