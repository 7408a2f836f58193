package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: time named queries and dump formatted plans.
  * Usage: runMain graft.Profile <query>[,<query>...] [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("msgparts")) {
      import org.apache.spark.sql.functions._
      val s = SparkEntry.tune(spark)
      val synth = graft.operators.Messages.syntheticMessages(s, sfDir)
      val schema = graft.operators.Messages.fullMessageSchema
      val perOrder = graft.Tables.lineitem(s, sfDir)
        .join(graft.Tables.part(s, sfDir), col("l_partkey") === col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(graft.operators.Typed.itemStruct)).as("itens"),
          sort_array(collect_list(graft.operators.Typed.produtoEnvelope)).as("produto_data"))
      // slim variant: shuffle raw fields only, wrap into envelopes post-agg
      val slim = graft.Tables.lineitem(s, sfDir)
        .join(graft.Tables.part(s, sfDir), col("l_partkey") === col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").cast("long").as("id"),
          col("l_partkey").as("idProduto"),
          (col("l_extendedprice") / col("l_quantity")).cast("string").as("valor"),
          col("l_quantity").cast("string").as("quantidade"),
          col("p_name").as("nome"),
          col("p_retailprice").cast("string").as("preco_custo"),
          col("p_brand").as("brand"), col("p_type").as("ptype")))).as("rows"))
        .select(col("l_orderkey"),
          transform(col("rows"), r => struct(
            r.getField("id").as("id"),
            r.getField("idProduto").as("idProduto"),
            concat(lit("item "), r.getField("idProduto").cast("string")).as("descricao"),
            r.getField("valor").as("valor"),
            r.getField("quantidade").as("quantidade"),
            (r.getField("idProduto") % 30).cast("string").as("desconto"))).as("itens"),
          transform(col("rows"), r => struct(struct(
            lit("3").as("status_processamento"),
            struct(r.getField("idProduto").as("id"), r.getField("nome").as("nome"),
              r.getField("preco_custo").as("preco_custo"),
              concat(r.getField("brand"), lit(" >> "), r.getField("ptype")).as("categoria")
            ).as("produto")).as("retorno"))).as("produto_data"))
      (1 to 2).foreach { i =>
        var t0 = System.nanoTime()
        perOrder.agg(sum(size(col("itens")) + size(col("produto_data")))).collect()
        println(f"assembly-only pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
        slim.agg(sum(size(col("itens")) + size(col("produto_data")))).collect()
        println(f"assembly-slim pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
        synth.agg(sum(length(col("data")))).collect()
        println(f"producer+encode pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
        synth.select(graft.operators.Messages.decode(col("data"), schema).as("m"))
          .agg(sum(length(col("m.uuid")))).collect()
        println(f"+decode(full) pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("message_roundtrip"))
    val doExplain = args.length > 1 && args(1) == "explain"
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) {
        println(s"===== PLAN $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
