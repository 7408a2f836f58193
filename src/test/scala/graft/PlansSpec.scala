package graft

import graft.operators.{Ingest, Writers}
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Specs for the custom expression (D12), sinks (J2/J3/J5/J6), and batch
  * ingest provenance (A2/D10). */
class PlansSpec extends SparkSuite {
  import spark.implicits._

  test("sorted_to_json canonicalises key order at every nesting level") {
    val r = spark.sql(
      """SELECT sorted_to_json(named_struct(
        |  'z', 1L, 'a', 'x"q', 'm', named_struct('y', 2L, 'b', 'v'),
        |  'arr', array(named_struct('q', 1L, 'p', 2L))))""".stripMargin)
      .collect()(0).getString(0)
    assert(r == """{"a":"x\"q","arr":[{"p":2,"q":1}],"m":{"b":"v","y":2},"z":1}""")
  }

  test("sorted_to_json null field renders as JSON null") {
    val r = spark.sql("SELECT sorted_to_json(named_struct('b', cast(null as string), 'a', 1L))")
      .collect()(0).getString(0)
    assert(r == """{"a":1,"b":null}""")
  }

  test("array_dot: codegen and interpreted eval agree, left-to-right fold, null passthrough") {
    // codegen path (whole-stage)
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
    // interpreted path (eval via filter on a literal — constant folding runs eval)
    val e = graft.plans.ArrayDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 32.0)
    // FP fold order is left-to-right (matches the oracle's list_reduce):
    // (1e16 + 1) + -1e16 == 0.0 under l-t-r, 1.0 under any reassociation
    val fp = spark.sql(
      "SELECT array_dot(array(1e16d, 1.0d, -1e16d), array(1.0d, 1.0d, 1.0d))")
      .collect()(0).getDouble(0)
    assert(fp == 0.0)
    // null array → null
    assert(spark.sql(
      "SELECT array_dot(cast(null as array<double>), array(1.0d))")
      .collect()(0).isNullAt(0))
  }

  test("array_dist2i: matches the HOF grid fold, ragged prefix, null passthrough") {
    // codegen path vs hand-computed: (1-4)²=9, (2-5)²=9, (3-6)²=9 → 27e6
    val r = spark.sql(
      "SELECT array_dist2i(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .collect()(0).getLong(0)
    assert(r == 27000000L)
    // interpreted path agrees
    val e = graft.plans.ArrayDist2I(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 27000000L)
    // equivalence with the higher-order form it replaced, on real vectors
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir).limit(50)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val both = emb.select(
      call_function("array_dist2i", col("v"), reverse(col("v"))).as("k"),
      aggregate(
        zip_with(col("v"), reverse(col("v")), (x, c) =>
          floor((x - c) * (x - c) * lit(1e6) + lit(0.5d)).cast("long")),
        lit(0L), (a, t) => a + t).as("h")).collect()
    both.foreach(r2 => assert(r2.getLong(0) == r2.getLong(1)))
    // ragged pair → common prefix, like array_dot
    assert(spark.sql(
      "SELECT array_dist2i(array(1.0d, 9.0d), array(1.0d))")
      .collect()(0).getLong(0) == 0L)
    // null array → null
    assert(spark.sql(
      "SELECT array_dist2i(cast(null as array<double>), array(1.0d))")
      .collect()(0).isNullAt(0))
  }

  test("J3: clustered write produces day partitions, sorted row groups") {
    val out = Files.createTempDirectory("clustered").toString + "/t"
    val df = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    Writers.writeClustered(df, "o_orderdate", Seq("o_custkey", "o_orderkey"), out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")))
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("bucketed layout: co-bucketed join + same-key aggregate run with zero exchanges") {
    val base = Files.createTempDirectory("bucketed").toString
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real join strategy decision — at sf0.001 everything
      // broadcasts, which would make "no exchange" vacuous
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Writers.writeBucketed(o, "o_orderkey", 8, "b_orders", s"$base/o")
      Writers.writeBucketed(l, "o_orderkey", 8, "b_lineitem", s"$base/l")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join/agg must reuse the write-time partitioning:\n${p.take(1500)}")
      // and the result is the same as the unbucketed plan
      val expect = o.join(l, "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = j.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("J5/J6: overwrite dim then keyed delete with count-verify") {
    val out = Files.createTempDirectory("dim").toString + "/t"
    val dim = Tables.customer(spark, sfDir).limit(100)
    Writers.overwriteDim(dim, out)
    Writers.overwriteDim(dim, out) // idempotent full refresh
    assert(spark.read.parquet(out).count() == 100)
    val doomed = spark.read.parquet(out).select("c_custkey")
      .limit(3).collect().map(_.getLong(0)).toSeq
    val remaining = Writers.deleteByKey(spark, out, "c_custkey", doomed)
    assert(remaining == 0)
    assert(spark.read.parquet(out).count() == 97)
  }

  test("J6/B5: keyed delete rewrites ONLY affected partitions; dry-run touches nothing") {
    val out = Files.createTempDirectory("fact").toString + "/t"
    val df = Tables.orders(spark, sfDir).limit(500)
      .select(col("o_orderkey"), col("o_orderdate"))
    Writers.writeDayPartitioned(df, "o_orderdate", out)
    // file → (size, mtime) for every data file under the table root
    def snapshot(): Map[String, (Long, Long)] = {
      val root = Paths.get(out)
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => (root.relativize(p).toString,
          (Files.size(p), Files.getLastModifiedTime(p).toMillis))).toMap
    }
    val all = spark.read.parquet(out)
    val someDate = all.select(col("p_date").cast("string")).distinct()
      .orderBy("p_date").limit(1).collect()(0).getString(0)
    val doomed = all.filter(col("p_date").cast("string") === someDate)
      .select("o_orderkey").limit(3).collect().map(_.getLong(0)).toSeq
    val before = snapshot()
    // B5 dry run: reports the doomed set, writes nothing
    assert(Writers.deleteByKey(spark, out, "o_orderkey", doomed,
      dryRun = true) == doomed.size)
    assert(snapshot() == before, "dry run must not touch any file")
    // real delete: count-verify 0, untouched partitions byte-identical
    assert(Writers.deleteByKey(spark, out, "o_orderkey", doomed) == 0)
    val after = snapshot()
    val affected = s"p_date=$someDate"
    before.filterNot(_._1.startsWith(affected)).foreach { case (f, meta) =>
      assert(after.get(f).contains(meta), s"untouched file changed: $f")
    }
    assert(after.keys.exists(_.startsWith(affected)), "affected partition rewritten")
    assert(spark.read.parquet(out).count() == 500 - doomed.size)
    assert(new java.io.File(out).getParentFile.listFiles()
      .forall(f => !f.getName.endsWith("._rewrite") && !f.getName.endsWith("._old")),
      "no scratch dirs left behind")
  }

  test("compaction: fragmented partitions coalesce, content identical, quiet ones untouched") {
    val out = Files.createTempDirectory("cmp").toString + "/t"
    val df = Tables.orders(spark, sfDir).limit(300)
      .select(col("o_orderkey"), col("o_orderdate"))
    // fragment: 5 appends, each a slice of the keys → many small files/partition
    (0 until 5).foreach(i =>
      Writers.writeDayPartitioned(df.filter(col("o_orderkey") % 5 === i),
        "o_orderdate", out))
    val rowsBefore = spark.read.parquet(out).orderBy("o_orderkey").collect()
    val (nCompacted, filesBefore, filesAfter) =
      Writers.compact(spark, out, targetBytes = 1L << 30)
    assert(nCompacted > 0 && filesAfter < filesBefore,
      s"compacted=$nCompacted files $filesBefore->$filesAfter")
    // 1 GB target → every fragmented partition collapses to a single file
    val perPart = new java.io.File(out).listFiles().filter(_.isDirectory).map(
      d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perPart.forall(_ == 1), perPart.mkString(","))
    val rowsAfter = spark.read.parquet(out).orderBy("o_orderkey").collect()
    assert(rowsAfter.sameElements(rowsBefore), "content must be unchanged")
    assert(new java.io.File(out).getParentFile.listFiles()
      .forall(f => !f.getName.endsWith("._rewrite") && !f.getName.endsWith("._old")))
  }

  test("swap recovery: a partition lost mid-swap is healed by the next mutator call") {
    val out = Files.createTempDirectory("rec").toString + "/t"
    Writers.writeDayPartitioned(Tables.orders(spark, sfDir).limit(100)
      .select(col("o_orderkey"), col("o_orderdate")), "o_orderdate", out)
    val total = spark.read.parquet(out).count()
    // simulate a crash between the two renames: partition renamed aside
    val victim = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("p_date=")).head
    val backup = new java.io.File(out + "._old/" + victim.getName)
    backup.getParentFile.mkdirs()
    assert(victim.renameTo(backup))
    assert(spark.read.parquet(out).count() < total, "partition really lost")
    // ANY mutator heals on entry — a dry-run delete is enough
    Writers.deleteByKey(spark, out, "o_orderkey", Seq(-1L), dryRun = true)
    assert(spark.read.parquet(out).count() == total, "partition restored")
    assert(!new java.io.File(out + "._old").exists())
    // simulate a completed swap whose cleanup was lost: stale backup while
    // the target exists — must be dropped, never nested into live data
    val stale = new java.io.File(out + "._old/" + victim.getName)
    stale.mkdirs()
    new java.io.File(stale, "stale.parquet").createNewFile()
    Writers.compact(spark, out, targetBytes = 1L)
    assert(!new java.io.File(out + "._old").exists(), "stale backup dropped")
    assert(spark.read.parquet(out).count() == total)
  }

  test("compaction handles the nested streaming layout (ingest_batch=N/p_date=D)") {
    val out = Files.createTempDirectory("cmp2").toString + "/t"
    val df = Tables.orders(spark, sfDir).limit(120)
      .select(col("o_orderkey"), col("o_orderdate"))
    (0 to 1).foreach { b => // two micro-batch dirs, each fragmented by 3 appends
      (0 until 3).foreach(i => // distinct keys per append, SAME dates → 3 files/day dir
        Writers.writeDayPartitioned(df.withColumn("o_orderkey",
          col("o_orderkey") + lit(1000000L * (b * 3 + i + 1))),
          "o_orderdate", s"$out/ingest_batch=$b"))
    }
    val rowsBefore = spark.read.parquet(out)
      .orderBy("ingest_batch", "o_orderkey").collect()
    val (nCompacted, filesBefore, filesAfter) =
      Writers.compact(spark, out, targetBytes = 1L << 30)
    assert(nCompacted > 0 && filesAfter < filesBefore,
      s"compacted=$nCompacted files $filesBefore->$filesAfter")
    val rowsAfter = spark.read.parquet(out)
      .orderBy("ingest_batch", "o_orderkey").collect()
    assert(rowsAfter.sameElements(rowsBefore), "content must be unchanged")
  }

  test("upsert: same-key rows replaced, new keys and partitions appended, others untouched") {
    val out = Files.createTempDirectory("ups").toString + "/t"
    val base = Tables.orders(spark, sfDir).limit(200)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    Writers.writeDayPartitioned(base, "o_orderdate", out)
    val before = spark.read.parquet(out)
    val total0 = before.count()
    // updates: 3 existing keys get a new price; 1 brand-new key in a new partition
    val someKeys = before.orderBy("o_orderkey").limit(3)
      .collect().map(_.getLong(0))
    val newDate = java.sql.Date.valueOf(
      before.agg(max("p_date")).head.getDate(0).toLocalDate.plusDays(400))
    val upd = before.filter(col("o_orderkey").isInCollection(someKeys))
      .withColumn("o_totalprice", lit(-1.0d))
      .unionByName(before.limit(1).select(
        lit(999999999L).as("o_orderkey"), lit(-2.0d).as("o_totalprice"),
        col("o_orderdate"), lit(newDate).as("p_date")))
    Writers.upsertByKey(spark, out, "o_orderkey", upd)
    val after = spark.read.parquet(out)
    assert(after.count() == total0 + 1) // replaced in place, one new row
    assert(after.filter(col("o_totalprice") === -1.0d).count() == 3)
    assert(after.filter(col("o_orderkey") === 999999999L).count() == 1)
    assert(after.filter(col("o_orderkey").isInCollection(someKeys))
      .filter(col("o_totalprice") =!= -1.0d).count() == 0, "no stale versions")
  }

  test("ORC sink/source: roundtrip preserves content, scan prunes and pushes down") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("orc").toString + "/t"
    val src = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    // content identical (set compare — file layout may reorder rows)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // column pruning + predicate pushdown reach the ORC scan exactly like
    // the parquet path the engine standardizes on
    val q = back.filter(col("o_custkey") === 7).select("o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)"),
      s"ORC pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"ORC pruning missing:\n$plan")
  }

  test("A4/D6: csv zone scan — explicit schema, page provenance, BR-date passthrough") {
    import org.apache.spark.sql.functions._
    val rows = operators.Ingest.csvZoneScan(spark, sfDir).collect()
    assert(rows.length == 500)
    // ids are the staged pure function i*3, every page represented
    assert(rows.map(_.getLong(0)).toSeq == (1 to 500).map(_ * 3L))
    assert(rows.map(_.getLong(3)).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // D6: parseable dates normalized, the 'n/d' rows passed through unchanged
    val (nd, ok) = rows.partition(r => r.getString(4) == "n/d")
    assert(nd.length == 50 && ok.forall(_.getString(4).matches("\\d{4}-\\d{2}-\\d{2}")))
  }

  test("viterbi_best kernel: numeric argmin, lexicographic path tie-break, loud on coverage gaps") {
    import spark.implicits._
    def vb(word: String, model: Map[String, Long]): String = {
      val ps = model.keys.toSeq.sorted
      Seq(word).toDF("word")
        .select(call_function("viterbi_best", col("word"),
          typedlit(ps), typedlit(ps.map(model))).as("b"))
        .collect().head.getString(0)
    }
    // equal total score (a+b == ab): the relational least() picks the
    // lexicographically smaller path string — 'a b' < 'ab' (space < 'b')
    assert(vb("ab", Map("a" -> -10L, "b" -> -10L, "ab" -> -20L))
      == "1000000020|a b")
    // strictly cheaper whole piece wins
    assert(vb("ab", Map("a" -> -10L, "b" -> -10L, "ab" -> -15L))
      == "1000000015|ab")
    // longer DP: abc via (ab,c) beats (a,bc) and singles
    assert(vb("abc", Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -12L, "bc" -> -15L)) == "1000000022|ab c")
    // a character outside the model must throw, never silently mis-segment
    intercept[Exception] { vb("ax", Map("a" -> -10L)) }
  }

  test("A2/D10: raw-zone scan extracts filename keys and processed-id set") {
    val zone = Files.createTempDirectory("zone").toString
    val uuid = "0123abcd-0123-abcd-0123-0123456789ab"
    Seq(101L, 102L, 102L).zipWithIndex.foreach { case (id, i) =>
      Files.writeString(
        Paths.get(s"$zone/z316-tiny-api-$id-pdv-2024010${i + 1}T120000-$uuid.json"),
        s"""{"versao":"1.0","cnpj":"1","tipo":"inclusao_pedido","dados":{"id":$id,"uuid":"u$i","valor":1.0,"event_ts":"2024-01-01 00:00:00"}}""")
    }
    val df = Ingest.readRawZone(spark, zone, Streaming.webhookSchema)
    val keys = Ingest.withFilenameKeys(df)
    assert(keys.filter(col("dados_id") === "" || col("data_type") =!= "pdv").count() == 0)
    assert(Ingest.processedIdSet(df).count() == 2)
  }
}
