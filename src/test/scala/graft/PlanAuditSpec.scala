package graft

import graft.operators._

/** Plan-shape regression tests — the scale properties the engine promises
  * must be visible in the physical plan, not just hoped for: dims broadcast,
  * aggregates partial+final, scans column-pruned, shuffle counts bounded.
  * A refactor that silently degrades any of these fails here, not at 100 TB.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("itens fact: both dims broadcast, one hash shuffle (window) + one range (sort)") {
    val p = plan(Facts.itensFact(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 == 2, p.take(500))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("pedidos fact: partial+final hash aggregation below the header join") {
    val p = plan(Facts.pedidosFact(spark, sfDir))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expected map-side partial aggregation")
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2)
  }

  test("triangles + basket rules: equi-joins only — never a cartesian or nested loop") {
    Seq(plan(Graph.triangleParts(spark, sfDir)),
        plan(Analytics.basketRules(spark, sfDir))).foreach { p =>
      assert(!p.contains("CartesianProduct"), p.take(800))
      // the only nested-loop allowed is the broadcast of a 1-row aggregate
      // (total-order/basket counts); a non-trivial BNLJ means the pair or
      // wedge join lost its equality keys
      val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
      assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n${p.take(800)}")
    }
  }

  test("url dedup: one slim hash shuffle, no text column in the aggregate") {
    val p = plan(CorpusOps.urlDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // normalization + dedup is scan → project → partial agg → exchange →
    // final agg → sort: exactly one hash exchange, and it carries urls,
    // never the document text (the scan must not even read `text`)
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    val scans = p.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.nonEmpty && scans.forall(!_.contains("text")),
      s"text column read by a url-only query:\n${scans.mkString("\n")}")
  }

  test("nn-descent: equi-joins only, node-grain windows, group-limit pushdown") {
    val p = plan(Similarity.annNndescent(spark, sfDir, rounds = 1))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // every top-k window is partitioned by the node id — a global window
    // here would serialize the whole candidate set through one task
    val winLines = p.split("\n").filter(_.contains("Window [row_number()"))
    assert(winLines.nonEmpty, p.take(500))
    assert(winLines.forall(_.contains("], [u#")),
      s"top-k window lost its node partitioning:\n${winLines.mkString("\n")}")
    assert(p.contains("WindowGroupLimit"), "rank filter did not push down")
  }

  test("graph search: equi-joins only, query-grain windows") {
    val p = plan(Similarity.annGraphSearch(spark, sfDir, hops = 1))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    val winLines = p.split("\n").filter(_.contains("Window [row_number()"))
    assert(winLines.nonEmpty, p.take(500))
    assert(winLines.forall(_.contains("], [query_id#")),
      s"beam window lost its query partitioning:\n${winLines.mkString("\n")}")
  }

  test("tfidf: the top-k window partitions by doc_id, with group-limit pushdown") {
    val p = plan(TextOps.tfidfTopk(spark, sfDir))
    // the 1-row n_docs aggregate legitimately plans an Exchange
    // SinglePartition; the property that matters is the WINDOW's spec —
    // partitioned by doc_id, never a global (empty-partition) window
    val winLines = p.split("\n").filter(_.contains("Window [row_number()"))
    assert(winLines.nonEmpty, p.take(500))
    assert(winLines.forall(_.contains("], [doc_id#")),
      s"top-k window lost its doc_id partitioning:\n${winLines.mkString("\n")}")
    // rank<=k pushes down as a group limit, pruning before the sort
    assert(p.contains("WindowGroupLimit"), "rank filter did not push down")
  }

  test("heavy hitters: sketch pass is partial+final, recount joins a broadcast candidate set") {
    val p = plan(Sketches.heavyHitters(spark, sfDir))
    // the MisraGries Aggregator must run as partial aggregation (map-side
    // sketches merged treewise): the plan shows TWO object aggregates for
    // the sketch — a partial_misragries and its final merge
    assert(p.toLowerCase.split("partial_misragries").length - 1 >= 1,
      s"sketch did not run as partial aggregation:\n${p.take(800)}")
    // and the recount must restrict the corpus via a broadcast join —
    // never a full-vocabulary hash shuffle
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p.take(800))
  }

  test("scd2 lookup: zero join operators — the as-of union-window plan") {
    val p = plan(Temporal.scd2Lookup(spark, sfDir))
    assert(!p.contains("Join"), s"as-of rewrite must not plan a join:\n${p.take(800)}")
    assert(p.contains("Window"))
  }

  test("rollup: one scan through Expand; pivot: dims broadcast, single aggregate") {
    val pr = plan(Analytics.salesRollup(spark, sfDir))
    assert(pr.contains("Expand"), "rollup must compile to grouping-set Expand")
    assert(pr.split("Scan parquet").length - 1 == 1, "rollup re-scanned the fact")
    val pp = plan(Analytics.salesPivot(spark, sfDir))
    assert(pp.split("BroadcastHashJoin").length - 1 == 3,
      "pivot enrichment dims must broadcast")
    assert(!pp.contains("CartesianProduct"))
  }

  test("journeys: sessionize windows and session agg share the user partitioning") {
    val p = plan(EventsOps.journeyTopk(spark, sfDir))
    // one hash exchange for the (user) windows; the session-grain groupBy
    // adds at most one more (user, sid); the journey count is the third —
    // anything above that means a partitioning was lost
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3, p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be partial TakeOrdered, not a global sort")
  }

  test("token count: parquet scan pruned to exactly (doc_id, text)") {
    val p = plan(TextOps.tokenCount(spark, sfDir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
  }

  test("anti-join dedupe: scan pushes the key filter down") {
    val p = plan(Quality.antiJoinDedupe(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey)]")
      || p.contains("PushedFilters: [IsNotNull(o_orderkey)"), p.take(800))
  }

  test("enrichment join chain: fact side never shuffles while dims are broadcast-eligible") {
    // customer is NOT hinted (it grows with the corpus) — but at test scale
    // it is under autoBroadcastJoinThreshold, so statistics must still pick
    // broadcast and the fact side must not shuffle
    val p = plan(Dimensions.enrichJoin(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 == 3)
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "fact side must not hash-shuffle for broadcast enrichment")
  }

  test("enrichment join chain: hinted tiny dims still broadcast when statistics can't") {
    // with auto-broadcast off (the 100 TB regime where customer outgrows
    // the threshold), nation/region keep their hints and customer falls
    // back to a shuffle join — never a forced driver-side broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(Dimensions.enrichJoin(spark, sfDir))
      assert(p.split("BroadcastHashJoin").length - 1 == 2, p.take(800))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "customer join must degrade to a shuffle join, not a forced broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("typed path: status gates never re-parse — no from_json in any Filter (opaque barrier)") {
    // The round-1 shape tokenized every payload twice: a minimal-schema
    // from_json duplicated into the pushed-down status filter plus the full
    // parse in the projection. With the opaque barrier the gate reads the
    // materialized struct, so no Filter condition may contain a parse.
    val lp = Typed.typedItensFact(spark, sfDir).queryExecution.optimizedPlan
    val filtersWithParse = lp.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.JsonToStructs]) => f
    }
    assert(filtersWithParse.isEmpty, filtersWithParse.mkString("\n").take(1200))
    // and the parse count is exactly one per payload zone (pdv + produto):
    // the fact builds are one-pass — header-grain sums are array folds
    // computed before the single explode, so no sibling aggregate branch
    // ever re-materializes the parse subtree
    assert(lp.toString.split("from_json").length - 1 == 2, lp.toString.take(800))
  }

  test("typed order fact: one-pass — one parse per zone (pdv, pesquisa, produto)") {
    val lp = Typed.typedPedidosFact(spark, sfDir).queryExecution.optimizedPlan
    assert(lp.toString.split("from_json").length - 1 == 3, lp.toString.take(800))
  }

  test("message channel: one-pass — single decode over the STAGED wire, zero producer work") {
    // The wire fixture is a staged artifact (r16): the consumer's plan must
    // hold exactly one decode over ONE staged-parquet scan, and ZERO
    // producer operators (no collect_list assembly, no to_json/base64, no
    // orders/lineitem/part scans) — the producer runs once per corpus
    // inside Staged, never in the subscriber's timed plan. Reconciliation
    // must still not fan into sibling subscriber branches (each would
    // re-read and re-decode the wire).
    val qe = Messages.messageRoundtrip(spark, sfDir).queryExecution
    val lp = qe.optimizedPlan.toString
    assert(lp.split("from_json").length - 1 == 1, lp.take(800))
    assert(!lp.contains("collect_list") && !lp.contains("to_json"),
      "producer work leaked into the consumer plan")
    val ep = qe.executedPlan.toString
    val scans = ep.split("Scan parquet").length - 1
    assert(scans == 1, s"expected ONE staged-wire scan, got $scans")
    assert(!ep.contains("Join"), "the one-pass reconciliation grew a join")
    // the fact-subscriber grains: same staged wire, zero joins, zero
    // producer operators (their builds are pure per-message array algebra)
    Seq(Messages.messagePedidosFact(spark, sfDir),
      Messages.messageItensFact(spark, sfDir)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Join") && !p.contains("collect_list"),
        "fact build must be join-free over the staged wire:\n" + p.take(600))
      assert(p.split("Scan parquet").length - 1 == 1,
        "fact build must read only the staged wire")
    }
  }

  test("item-grain aggregates hash, never sort: no string-buffered aggs") {
    // first()/min() over a STRING column carries a string aggregation
    // buffer, which HashAggregate cannot hold — the whole aggregate
    // silently downgrades to SortAggregate and fully sorts the exploded
    // item rows. Group-constant header columns belong in the GROUP KEY
    // (string keys hash fine). Small dim-side sorts are acceptable (the
    // produto dropDuplicates and the pesquisa vendedor min(struct) sort
    // dim-cardinality rows before a broadcast) — what must never sort is
    // the ITEM-grain aggregate, keyed by pedido_id / uuid.
    // match the item key ANYWHERE in the bracket list — anchoring on the
    // first key would let a groupBy reorder silently disable the guard
    val itemKeys = "SortAggregate\\(key=\\[[^\\]]*\\b(pedido_id|uuid)#".r
    Seq(Typed.typedItensFact(spark, sfDir),
      Typed.typedPedidosFact(spark, sfDir),
      Messages.messageRoundtrip(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(itemKeys.findFirstIn(p).isEmpty,
        "item-grain aggregate fell out of hash aggregation:\n" + p.take(800))
    }
  }

  test("contamination: benchmark n-gram set broadcasts, corpus never self-joins") {
    val p = plan(Dedup.contaminationCheck(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "benchmark set must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("minhash candidates: LSH band join, not a cross join") {
    val p = plan(Dedup.dedupMinhash(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on band signatures")
  }

  test("as-of join: linear union+window plan — zero join operators") {
    // the whole point of the union-tag design: the plan must contain NO
    // join at all (a theta join here is O(clicks × purchases) per user)
    val p = plan(Temporal.eventsAsof(spark, sfDir))
    assert(!p.contains("Join"), "as-of must be join-free:\n" + p.take(800))
    assert(p.contains("Window"))
    // click-dedup groupBy + window partitioning; presentation sort is range
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2, p.take(800))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("scd2 + seq_pack: stacked windows share ONE hash exchange") {
    // both lag/lead (scd2) and the running sum (seq_pack) partition the
    // same way — a second hash exchange would mean the window specs
    // diverged and the plan re-shuffles per window
    Seq(Temporal.scd2Build(spark, sfDir),
      CorpusOps.seqPack(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    }
  }

  test("quality filter + pii scrub: pruned scan, no shuffle but the sort") {
    Seq(CorpusOps.qualityFilter(spark, sfDir),
      CorpusOps.piiScrub(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        p.take(800))
      assert(p.split("Exchange hashpartitioning").length - 1 == 0,
        "per-row maps must not shuffle")
    }
  }

  test("kmeans: corpus never shuffles for assignment — centroids broadcast") {
    val p = plan(Clustering.kmeansTrain(spark, sfDir))
    // assignment = 1-row centroid list × corpus: a broadcast nested-loop,
    // NEVER a shuffled cartesian or a sort-merge join of the corpus
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "update aggregate must be map-side combined")
    // 2 iterations × (dim-grain agg + centroid reassembly) = 4 hash
    // exchanges, + the presentation sort; more means an iteration re-shuffled
    assert(p.split("Exchange hashpartitioning").length - 1 <= 4, p.take(800))
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("boilerplate ngrams: grams shuffle as 64-bit hashes, scan pruned") {
    val df = CorpusOps.boilerplateNgrams(spark, sfDir)
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(800))
    // df-count exchange + join-back + doc-grain agg; the exchange reuse
    // on the gram key keeps it ≤3 hash shuffles
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3, p.take(800))
    // the shuffled gram key is the md5num LONG, not the gram string: no
    // string-typed gram attribute survives into the exchanges
    assert(!p.contains("gram: string") && df.schema("n_grams").dataType
      == org.apache.spark.sql.types.LongType)
  }

  test("numeric profile: one scan, partial aggregation, value+type pruned") {
    val p = plan(Quality.numericProfile(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    assert(p.contains("partial_count") || p.contains("partial_min"),
      "profile aggregate must be map-side combined")
    assert(p.contains("ReadSchema: struct<ts:int96,event_type:string,value:double>")
      || p.contains("ReadSchema: struct<event_type:string,value:double"),
      p.take(1200))
  }

  test("copurchase: order-local pair join, top-k never sorts the full pair table") {
    val p = plan(Facts.copurchaseTopk(spark, sfDir))
    // distinct + self-join co-partition on the order key (exchange reused),
    // pair count re-shuffles on the pair — nothing else may shuffle
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3, p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // orderBy+limit must plan as TakeOrderedAndProject (per-partition top-k
    // + merge), not a global range-partitioned sort of every pair
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 0)
  }

  test("corpus pipeline: five stages, one scan, exactly two hash exchanges") {
    val p = plan(CorpusOps.corpusPipeline(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 2,
      "gate+scrub+split fuse per-row; only dedup and pack may shuffle:\n"
        + p.take(1200))
    assert(p.split("Scan parquet").length - 1 == 1, "one corpus scan")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string>"),
      p.take(1200))
  }

  test("stratified split: pure per-row map — no shuffle but the sort") {
    val p = plan(Sampling.stratifiedSplit(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 0, p.take(800))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p.take(800))
  }

  test("item neighbors: order-local pair join, per-item top-k pushed map-side") {
    val p = plan(Analytics.itemNeighbors(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the per-item rank cut must run before the final shuffle, not after
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    // item counts join the pair table as broadcasts at this scale
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p.take(1200))
  }

  test("split decontamination: eval shingles broadcast, hashes not strings") {
    val p = plan(Sampling.splitDecontaminate(spark, sfDir))
    // the train×eval containment is a broadcast probe of the eval hash set
    assert(p.contains("BroadcastHashJoin [h"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // one corpus scan per side (train + eval branch), nothing more
    assert(p.split("Scan parquet").length - 1 <= 2, p.take(1200))
  }

  test("global shuffle: shard window is hash-partitioned, single shuffle") {
    val p = plan(Sampling.globalShuffle(spark, sfDir))
    // one hash exchange (the shard partitioning) + the presentation sort
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(800))
  }

  test("rrf fusion: candidate generators probe broadcasts; fusion never scans") {
    val p = plan(Similarity.hybridRrf(spark, sfDir))
    // dense side: query vectors broadcast against the corpus; lexical side:
    // query terms + stats broadcast against the doc-term table. The only
    // nested-loop is the intended tiny query-vector cross join.
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // both rank cuts push map-side
    assert(p.split("WindowGroupLimit").length - 1 >= 2, p.take(1500))
  }

  test("incremental dedup: band/hash equi-joins only — batch probes base, no self cross") {
    val p = plan(Dedup.dedupIncremental(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("embedding drift: one cell shuffle, labels-sized output aggregation") {
    val p = plan(Clustering.embeddingDrift(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "cell means must partial-aggregate map-side")
  }

  test("token fertility: single aggregate over a pruned scan") {
    val p = plan(TextOps.tokenFertility(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    assert(p.contains("ReadSchema: struct<text:string,lang:string,n_chars:bigint>")
      || p.contains("ReadSchema: struct<lang:string"), p.take(800))
  }

  test("doc chunks: map-only — the presentation sort is the plan's only exchange") {
    val p = plan(CorpusOps.docChunks(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(p.split("Exchange").length - 1 == 1, "only the orderBy range exchange")
  }

  test("cdc chunks: boundary scan is map-only — no window, no join, one sort exchange") {
    val p = plan(CorpusOps.cdcChunks(spark, sfDir))
    assert(!p.contains("Window"), "CDC boundaries must come from array kernels, not a per-doc window")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(p.split("Exchange").length - 1 == 1, "only the orderBy range exchange")
  }

  test("cdc dedup: hash-grain aggregates only, never all-pairs") {
    val p = plan(CorpusOps.cdcDedup(spark, sfDir))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(800))
    // count(DISTINCT doc_id) plans as the two-stage distinct aggregate:
    // a (chunk_md5, doc_id)-grain partial dedup, then the chunk_md5-grain
    // final — exactly 2 hash exchanges, both map-side-combined
    assert(p.split("Exchange hashpartitioning").length - 1 == 2, p.take(1200))
    assert(p.contains("partial_count"), "chunk counts must combine map-side")
  }

  test("char coverage: (lang, char) aggregate partial-combines before the shuffle") {
    val p = plan(TextOps.charCoverage(spark, sfDir))
    assert(p.contains("partial_count"), "char counts must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dup score hist: candidate chain only — no all-pairs join") {
    val p = plan(Dedup.dupScoreHist(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("embedding outliers: centroids broadcast, corpus scores without a shuffle, top-k cut pushed") {
    val p = plan(Clustering.embeddingOutliers(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "centroid table must broadcast")
    assert(p.contains("WindowGroupLimit"), "per-label top-k must cut map-side")
    assert(p.contains("array_dist2i"), "distance must use the codegen kernel")
  }

  test("source overlap: signature min-aggs partial-combine; no document pair join") {
    val p = plan(Dedup.sourceOverlap(spark, sfDir))
    assert(p.contains("partial_min"), "source signatures must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("prefix join: hash-token equi-join only — exact algorithm, no all-pairs") {
    val p = plan(Dedup.dedupPrefixJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("kcore: final lineage is flat — one aggregate over the checkpointed core") {
    // the peel rounds run behind eager checkpoints (each round's edges are
    // consumed 3× by the next — see the operator doc), so the RETURNED
    // plan must be exactly: scan checkpointed RDD → count per node → sort.
    // A join or a re-derivation of the co-purchase self-join appearing
    // here would mean the checkpoint structure regressed.
    val p = plan(Graph.kcoreParts(spark, sfDir, rounds = 2))
    assert(p.contains("ExistingRDD"), "must read the checkpointed core")
    assert(!p.contains("Join"), "peel work must not replay in the final plan")
    assert(p.contains("partial_count"), "core degree combines map-side")
  }

  test("doc novelty: shingles cross as hashes, df aggregate partial-combines") {
    val p = plan(Dedup.docNovelty(spark, sfDir))
    assert(p.contains("partial_count"), "df must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("cdc merge: rank-1 cut pushes map-side, one key shuffle") {
    val p = plan(Temporal.cdcMerge(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
  }

  test("gap fill: day-grain aggregate then broadcast join — fact never re-shuffles") {
    val p = plan(Analytics.gapFill(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    // daily agg + presentation only; the generated axis never hash-shuffles
    assert(p.split("Exchange hashpartitioning").length - 1 <= 1, p.take(1000))
  }

  test("shard manifest: single partial+final aggregate over a pruned scan") {
    val p = plan(Sampling.shardManifest(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(800))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      p.take(800))
  }

  /** A Window fed by `Exchange SinglePartition` is the one-task wall the
    * distributed-cumsum rewrite exists to avoid. In the plan string the
    * window sits at most a Sort away from its input exchange. */
  private def partitionlessWindows(p: String): Int = {
    val lines = p.split("\n")
    lines.indices.count { i =>
      lines(i).contains("Window ") &&
        (i + 1 to math.min(i + 3, lines.length - 1))
          .exists(j => lines(j).contains("Exchange SinglePartition"))
    }
  }

  test("abc parts: running sum is range-partitioned — no single-partition window") {
    // the ranged grain table is localCheckpointed (boundary consistency —
    // see rangedRunningSum), so the final plan reads it back as an RDD
    // scan; the cumsum window must partition by rid over that scan
    val p = plan(Analytics.abcParts(spark, sfDir))
    assert(partitionlessWindows(p) == 0,
      "cumulative sum fell back to a one-task window:\n" + p.take(1200))
    assert(p.contains("Window ["), "expected the per-range running-sum window")
    assert(p.contains("Scan ExistingRDD"),
      "expected the checkpointed ranged grain table:\n" + p.take(1200))
  }

  test("rfm: all three rank windows partitioned — no single-partition window") {
    val p = plan(Analytics.rfmSegments(spark, sfDir))
    assert(partitionlessWindows(p) == 0,
      "an ntile rank fell back to a one-task window:\n" + p.take(1200))
    assert(p.contains("Window ["), "expected the per-range rank window")
  }

  test("sales cube: one Expand (4 grouping sets), one pass over each table") {
    val p = plan(Analytics.salesCube(spark, sfDir))
    assert(p.split("\\bExpand\\b").length - 1 == 1,
      "cube must expand grouping sets once, from one scan:\n" + p.take(1200))
    assert(p.split("Scan parquet").length - 1 == 4,
      "orders/customer/nation/region each scanned exactly once:\n" + p.take(1200))
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p.take(1200))
  }

  test("sales pivot: fixed value list — single aggregate, no Expand, dims broadcast") {
    val p = plan(Analytics.salesPivot(spark, sfDir))
    // a fixed-values pivot plans as Spark's two-level aggregate — partial
    // over (yr, region) then pivot-first over yr, both map-side combined —
    // with no Expand; the dynamic form would have run a distinct collect
    // before this plan even built
    assert(p.split("\\bExpand\\b").length - 1 == 0, p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2, p.take(1200))
    assert(p.split("BroadcastHashJoin").length - 1 == 3, p.take(1200))
    assert(p.split("Scan parquet").length - 1 == 4, p.take(1200))
  }

  test("substring dup spans: hashes shuffle as longs, sweep shares the doc partitioning") {
    val p = plan(Dedup.substringDupSpans(spark, sfDir))
    // stats + two passes over the window subtree (df count, join-back) —
    // the lag-sweep folded coverage into the dup-count aggregate, so the
    // dup branch executes once (was 5 scans / 10 exchanges before)
    assert(p.split("Scan parquet").length - 1 == 3, p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 <= 5, p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(1200))
  }

  test("bm25 retrieval: query terms broadcast — candidate gen is an index probe") {
    val p = plan(TextOps.bm25Topk(spark, sfDir))
    // the query-term table (with its dfs) joins the corpus-sized doc-term
    // table as a broadcast — a shuffle here would re-partition the whole
    // corpus per query batch
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(1200))
  }

  test("bm25 indexed serving: the query path reads the staged prefix — the per-term posting window is gone") {
    val p = plan(TextOps.bm25TopkIndexed(spark, sfDir))
    // the impact index arrives as a parquet scan of the staged prefix,
    // not a recomputation over the corpus postings
    assert(p.contains("graft_staged/bm25_impact"),
      s"query path must read the staged index:\n${p.take(1200)}")
    // the full-posting impact window lives ONLY in the once-per-corpus
    // build: the serving plan must have no window partitioned by token —
    // that window is where a stop-word term becomes a corpus-sized single
    // partition
    assert(!p.contains("windowspecdefinition(token#"),
      s"a token-partitioned window leaked into the serving path:\n${p.take(1200)}")
    // query terms broadcast against the prefix-sized index
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the documents scan serves only the query docs' tokens
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(1200))
  }

  test("graph serving: the edge table behind the walk is a pure staged read — the descent never re-runs") {
    // the walk itself hides its inputs behind localCheckpoint lineage cuts,
    // so audit the edge table the walk consumes: after any first use it
    // must be a bare parquet scan of the staged dir — zero joins, zero
    // windows, zero exchanges (a descent rebuild would show all three)
    Seq(7, 3, -1).foreach { qMod =>
      val edges = Similarity.stagedDescentEdges(spark, sfDir, qMod,
        5, 100, 2, 137)
      val p = plan(edges)
      assert(p.contains("graft_staged/ann_graph"),
        s"qMod=$qMod edge table must read the staged parquet:\n${p.take(800)}")
      Seq("Join", "Window", "Exchange").foreach(op =>
        assert(!p.contains(op),
          s"qMod=$qMod staged read must be scan-only, found $op:\n${p.take(800)}"))
    }
    // and the serving queries stay cartesian-free end to end
    Seq(plan(Similarity.annGraphSearchOos(spark, sfDir)),
        plan(Similarity.annGraphInsert(spark, sfDir))).foreach { p =>
      assert(!p.contains("CartesianProduct"), p.take(1200))
    }
  }

  test("bm25 index build: two-stage top-cap — no window over raw postings anywhere") {
    // the r14 verdict's one weak plan: the build ranked each term's FULL
    // posting list in one token-partitioned window, so a stop-word term
    // was a corpus-sized single task. The v2 build is the mergeable
    // ImpactTopKAggregator two-stage form: map-side partial top-cap
    // buffers, then a final merge over ≤ cap·partitions rows per term —
    // NO window operator may appear in the build plan at all
    val p = plan(TextOps.impactIndexBuildFrame(spark, sfDir, 1.2, 0.75, 64))
    assert(!p.contains("Window"),
      s"a window survived in the impact-index build:\n${p.take(1500)}")
    // the rank must be the typed aggregation, partial+final (mergeable)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the typed top-cap aggregation:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(1200))
  }

  test("bm25 index merge: batch-only corpus reads — the base corpus is never re-scanned") {
    val p = plan(TextOps.bm25IndexMerge(spark, sfDir))
    assert(p.contains("graft_staged/bm25_impact"),
      s"merge must read the staged base index:\n${p.take(1200)}")
    // the only documents scans serve the batch stripe: every one is
    // filtered to doc_id % 10 = 9 (count the scans, count the filters)
    val docScans = p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(docScans >= 1, s"expected a batch documents scan:\n${p.take(1200)}")
    assert(p.contains("= 9)"),
      s"batch stripe filter missing from the merge plan:\n${p.take(1200)}")
    assert(!p.contains("NOT (pmod"),
      "a base-stripe (NOT % 10 = 9) corpus read leaked into the merge " +
        s"path — the base must come from the staged index only:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("graph generation chain: batch 4's walk reads the staged gen-1 edges — the base never re-descends") {
    // warm gen 1 so the gen-2 build can read it as a stage
    Similarity.stagedGraphGen(spark, sfDir, 1, 5, 100, 2, 137, 64, 3, 0, 8)
    val staged = Similarity.stagedGraphGen(spark, sfDir, 1,
      5, 100, 2, 137, 64, 3, 0, 8)
    val ps = plan(staged)
    assert(ps.contains("graft_staged/ann_gen"),
      s"gen-1 must arrive as the staged parquet:\n${ps.take(800)}")
    Seq("Join", "Window", "Exchange").foreach(op =>
      assert(!ps.contains(op),
        s"staged gen read must be scan-only, found $op:\n${ps.take(800)}"))
    // the gen-2 build walks batch 4 against that stage (the walk hides
    // its hops behind localCheckpoint cuts; the graph input's provenance
    // is the auditable part) and stays cartesian-free
    val p = plan(Similarity.graphGenBuildFrame(spark, sfDir, 2,
      5, 100, 2, 137, 64, 3, 0, 8))
    assert(p.contains("graft_staged/ann_gen"),
      s"gen-2 build must read the staged gen-1 edges:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("bm25 generation chain: each apply reads gen-1's parquet + its own batch only") {
    // warm the chain so gen 1 exists as a stage
    TextOps.stagedImpactGen(spark, sfDir, 2, 1.2, 0.75, 64)
    val (prefix, stats) = TextOps.impactGenBuildFrames(spark, sfDir, 2,
      1.2, 0.75, 64)
    Seq(plan(prefix), plan(stats)).foreach { p =>
      // the previous generation arrives as the staged pair, not a rebuild
      assert(p.contains("graft_staged/bm25_gen"),
        s"gen-2 apply must read the staged gen-1 pair:\n${p.take(1200)}")
      // the ONLY documents reads serve batch 9: a re-read of the gen-0
      // base stripe (< 8) or batch 8's postings would show their filters
      assert(!p.contains("< 8)") && !p.contains("= 8)"),
        s"a base/batch-1 corpus read leaked into the gen-2 apply:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), p.take(1200))
    }
    // the prefix merge is the two-stage aggregator, never a token window
    assert(!plan(prefix).contains("Window"),
      s"a window survived in the apply merge:\n${plan(prefix).take(1200)}")
    val docScans = plan(prefix).split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(docScans >= 1 && plan(prefix).contains("= 9)"),
      s"expected the batch-9 documents scan:\n${plan(prefix).take(1500)}")
  }

  test("pq serving: ann_pq and ann_ivfpq read the persisted codebooks+codes — the Lloyd chain never re-runs") {
    // after any first use the two PQ queries read the staged pair: the
    // training (which localCheckpoints, hiding itself from plans) is
    // replaced by two parquet scans of the staged dirs, visible directly
    Seq(plan(Similarity.annPq(spark, sfDir)),
        plan(Similarity.annIvfPq(spark, sfDir)),
        plan(Similarity.annIvfPqRes(spark, sfDir))).foreach { p =>
      assert(p.contains("graft_staged/pq_v1"),
        s"PQ serving must read the staged artifacts:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), p.take(1200))
    }
    // the IVF composites also route against the PERSISTED coarse
    // centroids — no per-query label-mean corpus aggregate remains
    Seq(plan(Similarity.annIvfPq(spark, sfDir)),
        plan(Similarity.annIvfPqRes(spark, sfDir))).foreach { p =>
      assert(p.contains("graft_staged/ivf_cent"),
        s"IVF routing must read the staged centroids:\n${p.take(1200)}")
    }
  }

  test("incremental media dedup: batch-only decode probes the staged base signatures") {
    Seq(plan(Multimodal.imageDedupIncremental(spark, sfDir)),
        plan(Multimodal.audioDedupIncremental(spark, sfDir)),
        plan(Multimodal.videoDedupIncremental(spark, sfDir))).foreach { p =>
      assert(!p.contains("CartesianProduct"), p.take(1200))
      // every decode stage in the plan is the BATCH lambda (the one
      // logical decode's subtree repeats across the ex/nr branches), and
      // the id scan feeding it carries the batch stripe filter — an
      // ingest's decode cost is batch-sized
      assert(p.split("MapPartitions").length - 1 >= 1,
        s"expected the batch decode stage:\n${p.take(1500)}")
      assert(p.contains("= 9)"),
        s"batch-side stripe filter missing:\n${p.take(1200)}")
      // the base arrives as the precomputed staged signature table — a
      // bare parquet scan, never a second corpus decode
      assert(p.contains("graft_staged/media_sigs"),
        s"base side must read the staged signatures:\n${p.take(1500)}")
      assert(!p.contains("NOT (pmod("),
        "a base-stripe corpus decode leaked back into the incremental " +
          s"path:\n${p.take(1500)}")
    }
  }

  test("temperature mix: corpus side is one broadcast probe — no corpus shuffle") {
    val p = plan(Sampling.mixTemperature(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p.take(1200))
    // the only hash exchanges belong to the tiny per-stratum count agg
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2, p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p.take(1200))
  }

  test("domain mix: corpus-size-free trainer — one token explode, map-side " +
    "combines, no cartesian on any corpus-grain side") {
    // audit the corpus-grain half pre-checkpoint (the trainer cuts lineage)
    val p = plan(Sampling.domainLoss(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "the (domain, token) and vocab aggregates must combine map-side")
    // the token scan reads exactly (source, text) — nothing else leaves the files
    assert(p.contains("ReadSchema: struct<source:string,text:string>") ||
      p.contains("ReadSchema: struct<text:string,source:string>"), p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"),
      "nothing in the loss build may range-partition")
    // the full query's k-row training loop never touches the corpus again:
    // every scalar-aggregate round runs on checkpointed k-row frames
    val full = plan(Sampling.domainMix(spark, sfDir))
    assert(!full.contains("CartesianProduct"), full.take(1200))
  }

  test("brand/nation margin: nation keeps its hint when stats can't broadcast; " +
    "part and supplier degrade to shuffle joins, never a forced broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(Analytics.brandNationMargin(spark, sfDir))
      assert(p.split("BroadcastHashJoin").length - 1 == 1, p.take(1200))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "catalog dims must fall back to shuffle joins:\n" + p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hll: register maxima combine map-side — the sketch merge IS the partial-agg tree") {
    val p = plan(Sketches.hllDistinct(spark, sfDir))
    assert(p.contains("partial_max"), "register max must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("bpe pairs: vocab-first — two aggregates, top-k never sorts globally") {
    val p = plan(TextOps.bpePairs(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 2,
      "exactly the word-count and pair-sum shuffles:\n" + p.take(1200))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be per-partition take + driver merge, not a global sort")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "both aggregates combine map-side")
  }

  test("weighted sample: per-doc min combines map-side; bottom-k is TakeOrdered") {
    val p = plan(Sampling.weightedSample(spark, sfDir))
    assert(p.contains("partial_min"), "min-hash keys must combine map-side")
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k must never range-shuffle the corpus:\n" + p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("fuzzy match: blocked equi-join — levenshtein never runs all-pairs") {
    val p = plan(Quality.fuzzyMatch(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("rolling revenue: one customer hash exchange feeds the window; range only for the sort") {
    val p = plan(Analytics.rollingRevenue(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("len quantiles: exact percentile aggregates partial+final") {
    val p = plan(TextOps.lenQuantiles(spark, sfDir))
    assert(p.contains("partial_percentile"),
      "percentile state must combine map-side:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("quantiles 2pass: range guard pushed to the scan; window partitioned by bucket") {
    val p = plan(Sketches.quantiles2pass(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_extendedprice"),
      "the ±1-bucket range guard must reach the parquet reader:\n" + p.take(1500))
    assert(!p.contains("Exchange SinglePartition"),
      "selection must never collapse to one partition:\n" + p.take(1200))
    assert(p.contains("Window") && p.contains("hashpartitioning(b#"),
      "row_number must run partitioned by bucket:\n" + p.take(1200))
  }

  test("group quantiles: every window partitioned, no driver collect shape") {
    val p = plan(Sketches.groupQuantiles2pass(spark, sfDir))
    assert(!p.contains("Exchange SinglePartition"),
      "per-group selection must stay distributed:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(p.contains("hashpartitioning(g#"),
      "group-keyed exchanges expected:\n" + p.take(1200))
  }

  test("dq expectations: conditional-agg + anti-join — fact twice, dim once, no more") {
    val p = plan(Quality.dqExpectations(spark, sfDir))
    assert(p.split("FileScan parquet").length - 1 == 3,
      "any number of column rules must stay 3 scans (fact ×2 + dim):\n" + p.take(1200))
    assert(p.contains("LeftAnti"), "referential rule missing:\n" + p.take(800))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("bloom semi join: probe filtered by the bitset BEFORE the exact semi join") {
    val p = plan(Sketches.bloomSemiJoin(spark, sfDir))
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("xxhash64"), "bit-test filter missing:\n" + p.take(1200))
    // the only nested loop is the 1-row bitset broadcast
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, p.take(1200))
    assert(!p.contains("CartesianProduct"))
    // bit test must sit below the semi join, not above it
    assert(p.indexOf("xxhash64") > p.indexOf("LeftSemi"),
      "probe-side bloom filter must be under the join in the plan tree")
  }

  test("embedding gram: one corpus scan feeding a partial+final typed aggregate") {
    val p = plan(Clustering.embeddingGram(spark, sfDir))
    assert(p.split("FileScan parquet").length - 1 == 1,
      "gram must be a single-scan accumulator:\n" + p.take(1200))
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "typed aggregator expected:\n" + p.take(1200))
    assert(p.contains("partial_gramagg") || p.contains("partial_"),
      "buffer must combine map-side:\n" + p.take(1200))
  }

  test("rfm approx: no window anywhere — cuts broadcast, scores are per-row maps") {
    val p = plan(Analytics.rfmSegmentsApprox(spark, sfDir))
    assert(!p.contains("Window"), "approx scoring must not rank:\n" + p.take(1200))
    assert(p.contains("partial_percentile_approx"),
      "cut sketch must combine map-side:\n" + p.take(1200))
    // 1-row broadcasts only: the cuts, plus the order-date anchor on each
    // of base's two consumers (cuts aggregate + final projection)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3,
      "only the anchor + cuts 1-row broadcasts allowed:\n" + p.take(1200))
  }

  test("substring excise: equi-joins only, reassembly combines map-side") {
    val p = plan(Dedup.substringExcise(spark, sfDir))
    // the rewrite branch must stay linear: dup hashes join hash-to-hash,
    // covered positions anti-join on (doc, pos) — never a cartesian or a
    // per-token nested membership scan
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("LeftAnti"), "covered positions must prune via anti-join:\n"
      + p.take(1200))
    // (pos, token) reassembly is a partial+final collect, so token rows
    // combine before the final doc exchange
    assert(p.contains("partial_collect_list"),
      "reassembly must combine map-side:\n" + p.take(1200))
  }

  test("skew join: the join keys on (key, salt) — the hot key actually spreads") {
    val p = plan(Skew.skewJoinAgg(spark, sfDir))
    val joinLine = p.split("\n").find(_.contains("HashJoin")).getOrElse("")
    assert(joinLine.contains("__salt_p") && joinLine.contains("__salt_b"),
      s"join lost its salt keys (hot keys would re-funnel):\n$joinLine")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("bpe encode: vocabulary-grain equi-joins, no cartesian, corpus scans bounded") {
    val p = plan(TextOps.bpeEncode(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // doc budgets: one (doc,word) checkpoint feeds the vocab derivation
    // and the budget join; only the final left join re-reads documents
    assert(p.split("FileScan parquet").length - 1 <= 1,
      "encode plan re-scans the corpus:\n" + p.take(1200))
  }

  test("n-gram family runs the native kernel — the interpreted HOF must not return") {
    // regression guard for the adjacent_grams switch: the transform(sequence)
    // pair-assembly measured 3.3 s vs 0.14 s for a plain explode at sf0.1;
    // any of these plans re-growing the HOF is a silent 2-4× loss
    Seq(
      "bigram_lm" -> plan(TextOps.bigramLm(spark, sfDir)),
      "doc_lm_score" -> plan(TextOps.docLmScore(spark, sfDir)),
      "contamination_check" -> plan(Dedup.contaminationCheck(spark, sfDir)),
      "dedup_minhash" -> plan(Dedup.dedupMinhash(spark, sfDir))
    ).foreach { case (name, p) =>
      assert(p.contains("adjacent_grams"),
        s"$name lost the native n-gram kernel:\n${p.take(800)}")
      assert(!p.contains("transform(sequence"),
        s"$name reintroduced the interpreted HOF assembly:\n${p.take(800)}")
    }
  }

  test("semdedup: cell equi-join pairs; only the broadcast centroid rows nest") {
    val p = plan(Dedup.dedupSemantic(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the 1-row collected-centroid list broadcasts to every corpus row
    // (assignment) — ONE nested loop per side of the self-join; the PAIR
    // join itself must be an equi-join on the cell id
    val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
    assert(bnlj <= 2, s"pair join lost its cell key ($bnlj nested loops)")
    assert(p.contains("hashpartitioning(cid"),
      "pairs must co-locate by cell id:\n" + p.take(1200))
  }

  test("semantic decontamination: cross-set bucket equi-join, train never self-joins") {
    val p = plan(Dedup.semanticDecontaminate(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the bucket equi-join:\n" + p.take(1200))
  }

  test("moore lewis + pmi: vocab-grain joins; the 1-row totals broadcast") {
    Seq(plan(TextOps.mooreLewis(spark, sfDir)),
        plan(TextOps.pmiCollocations(spark, sfDir))).foreach { p =>
      assert(!p.contains("CartesianProduct"), p.take(1200))
      // exactly the single 1-row totals aggregate may nest-loop broadcast
      val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
      assert(bnlj <= 1, s"unexpected nested loops ($bnlj):\n${p.take(1200)}")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        "count aggregates lost map-side combine")
    }
  }

  test("dp noisy counts: one corpus aggregate, scalar noise — no joins at all") {
    val p = plan(Quality.dpNoisyCounts(spark, sfDir))
    assert(!p.contains("Join"), "noise must be scalar math on the group table:\n"
      + p.take(1200))
    // two ε arms re-aggregate the same scan; a shared-scan union keeps the
    // exchange count at one per arm
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2)
  }

  test("residual IVF-PQ: no cartesian pair scan; codes + lookup tables ride broadcasts") {
    val p = plan(Similarity.annIvfPqRes(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // centroid/routing/ADC-table/rerank sides all broadcast — the corpus
    // side (codes, then survivors) must never be the build side
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      "expected the routed/ADC/rerank joins on broadcasts:\n" + p.take(1200))
    assert(p.contains("partial_sum"), "ADC sum must combine map-side")
  }

  test("dsir: term table hash-joins, ranking is TakeOrdered — never a global sort") {
    val p = plan(TextOps.dsirWeights(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not Sort+Limit:\n" + p.take(1200))
    assert(p.contains("adjacent_grams"), "bigram features must use the kernel")
    assert(!p.contains("CartesianProduct"))
  }

  test("count-min: cells partial-combine to a sketch-sized shuffle; estimate probes a broadcast") {
    val p = plan(Sketches.cmsCounts(spark, sfDir))
    assert(p.contains("partial_count"), "cells lost map-side combine")
    assert(p.contains("BroadcastHashJoin"), "d×w cell table must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k by true count must be TakeOrdered:\n" + p.take(1200))
  }

  test("hh replay: shard sizes broadcast; candidate/count joins are equi-joins only") {
    val p = plan(graft.streaming.Streaming.hhReplay(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), "n_shard table must broadcast")
  }

  test("multimodal decode: payloads never shuffle — the doc sort is the only exchange") {
    val p = plan(Multimodal.multimodalDecode(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "encode→decode must fuse in one stage:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("lr quality: the weight table broadcasts, no cartesian anywhere in the scoring plan") {
    val p = plan(operators.CorpusOps.lrQuality(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "the 4097-row model must broadcast, never shuffle the corpus to it")
  }

  test("unigram encode: vocabulary-grain join, no cartesian — corpus text never re-segments") {
    val df = operators.TextOps.unigramEncode(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // r17: the trained segmentation arrives as the STAGED vocab table
    // (the tokenizer is a persisted artifact for its consumers — training
    // lives in unigram_lm's own timed plan and in the once-per-corpus
    // stage build); the encode plan must read it, never re-train
    assert(p.contains("graft_staged/unigram_seg"),
      "encode must read the staged trained segmentation:\n" + p.take(800))
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("viterbi_best"),
      "training leaked into the consumer plan:\n" + lp.take(800))
  }

  test("unigram lm: the emitted plan is join-free — the model rides as a literal") {
    val p = plan(operators.TextOps.unigramLm(spark, sfDir))
    assert(!p.contains("Join"),
      "piece lookups must hit the vocab literal, not a join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("unigram soft: the emitted plan is join-free — the soft-trained model rides as a literal") {
    val p = plan(operators.TextOps.unigramSoft(spark, sfDir))
    assert(!p.contains("Join"),
      "piece lookups must hit the vocab literal, not a join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("multimodal video: GIF payloads never shuffle — the doc sort is the only exchange") {
    val p = plan(Multimodal.multimodalVideo(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "encode→frame-sample must fuse in one stage:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("multimodal audio: WAV payloads never shuffle — the doc sort is the only exchange") {
    val p = plan(Multimodal.multimodalAudio(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "encode→decode must fuse in one stage:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("message facts: the self-contained message makes both fact grains join- and shuffle-free") {
    // plan over a materialized wire (what the log subscriber reads) so the
    // producer fixture's joins don't obscure the claim: the fact BUILD is
    // pure per-row array algebra — no join, no hash exchange, the final
    // sort is the only exchange
    val dir = java.nio.file.Files.createTempDirectory("wire").toString
    operators.Messages.syntheticMessages(spark, sfDir)
      .write.mode("overwrite").parquet(dir)
    val wire = spark.read.parquet(dir)
    Seq(
      operators.Messages.pedidosFactFinal(operators.Messages.pedidosFactOf(
        operators.Messages.decodeForFacts(wire))).orderBy("pedido_id"),
      operators.Messages.itensFactFinal(operators.Messages.itensFactOf(
        operators.Messages.decodeForFacts(wire))).orderBy("pedido_id", "item_id")
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Join"), "fact build must be join-free:\n" + p.take(1200))
      assert(p.split("Exchange hashpartitioning").length - 1 == 0,
        "fact build must not shuffle:\n" + p.take(1200))
      assert(p.split("Exchange rangepartitioning").length - 1 == 1)
    }
  }

  test("sft render: one conversation shuffle — offsets, stats and render share the exchange, no join") {
    val p = plan(operators.CorpusOps.sftRender(spark, sfDir))
    assert(!p.contains("Join"), "render must not join conv stats back:\n" + p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      "the ordered and whole-partition windows must share one exchange:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("dpo pairs: one prompt shuffle — rank lanes, group count and pair pivot share the exchange") {
    val p = plan(operators.CorpusOps.dpoPairs(spark, sfDir))
    assert(!p.contains("Join"), "pair pivot must not join lanes back:\n" + p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      "the two rank lanes and the same-key groupBy must share one exchange:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("sft pack: three keyed exchanges, all equi — render window, shard window, conv join-back") {
    val p = plan(operators.CorpusOps.sftPack(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3,
      "conv window + shard window + join-back is the whole shuffle budget:\n" +
        p.take(1200))
  }

  test("sft pipeline: one scan, two hash exchanges, zero joins — all four stages ride the window chain") {
    val p = plan(operators.CorpusOps.sftPipeline(spark, sfDir))
    assert(!p.contains("Join"),
      "the composed pipeline must be a join-free window chain:\n" + p.take(1200))
    assert(p.split("Scan parquet").length - 1 == 1,
      "one conversation scan feeds all four stages:\n" + p.take(1200))
    // conv window (render offsets + DPO lanes) and shard window (packing
    // running total); the (shard, pack_id) stats window reuses the shard
    // partitioning — a third exchange would mean that reuse broke
    assert(p.split("Exchange hashpartitioning").length - 1 == 2,
      "exactly the conv and shard exchanges:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("sft pack tokens: document text never shuffles — only slim word and conv rows cross exchanges") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = operators.CorpusOps.sftPackTokens(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    // words shuffle (the tokenizer join is word-grain by design); the
    // document text column itself must never cross an exchange
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"an exchange carries the document text: ${e.output.map(_.name)}")
    }
  }

  test("sft pipeline tokens: one conversation scan, two corpus hash exchanges, text never shuffles") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = operators.CorpusOps.sftPipelineTokens(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // 1 conversation scan + the STAGED trained-segmentation scan (r17: the
    // tokenizer trainer no longer runs inside the consumer plan): the wrn=1
    // turn-collapse replaces sftPackTokens' aggregate-and-join-back, whose
    // plan re-reads the conversation table (8 scans total, measured)
    assert(p.split("Scan parquet").length - 1 == 2,
      "one conversation scan + one staged-seg scan must feed all four stages:\n" + p.take(1200))
    assert(p.contains("graft_staged/unigram_seg"),
      "the tokenizer must arrive as the staged artifact:\n" + p.take(1200))
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    // corpus-side budget: the conv_id repartition (serving the turn-grain,
    // render and DPO windows) + the shard running-total window. The
    // trained-piece join BROADCASTS at this scale (vocabulary-grain side);
    // past the broadcast threshold it degrades to exactly ONE added
    // word-grain exchange — the doc's 3-exchange bound
    val conv = exchanges.filter(e =>
      e.outputPartitioning.isInstanceOf[HashPartitioning] &&
        e.output.exists(_.name == "conv_id"))
    assert(conv.length == 2,
      s"conv+shard is the corpus shuffle budget, got ${conv.map(_.outputPartitioning)}")
    // the no-text invariant is absolute: no exchange anywhere in the plan
    // (tokenizer trainer included) may carry the document text
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"an exchange carries the document text: ${e.output.map(_.name)}")
    }
  }

  test("image dedup: banded LSH equi-join only — no cartesian, payloads never leave the scan stage") {
    val df = Multimodal.imageDedup(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the band equi-join, never all-pairs:\n" +
        p.take(1200))
    assertNoBinaryShuffles(df)
  }

  /** The typed form of "payloads never leave the scan stage": walk the
    * executed plan's shuffle exchanges and assert none of their output
    * attributes is binary — a string grep for a column name would pass
    * vacuously (the payload is lambda-local inside mapPartitions and can
    * never appear in the plan text under that name). */
  private def assertNoBinaryShuffles(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE wraps the tree in AdaptiveSparkPlanExec, which hides the inner
    // operators from collect() — unwrap to the current physical plan first
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected at least the band/pair shuffles")
    exchanges.foreach { e =>
      assert(!e.output.exists(_.dataType ==
          org.apache.spark.sql.types.BinaryType),
        s"an exchange carries a binary column: ${e.output.map(_.name)}")
    }
  }

  test("audio dedup: banded LSH equi-join only — no cartesian, WAV payloads never leave the scan stage") {
    val df = Multimodal.audioDedup(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assertNoBinaryShuffles(df)
  }

  test("video dedup: banded LSH equi-join only — no cartesian, GIF payloads never leave the scan stage") {
    val df = Multimodal.videoDedup(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assertNoBinaryShuffles(df)
  }

  test("multimodal dispatch: mixed-mime payloads never shuffle — encode and per-mime decode fuse") {
    val p = plan(Multimodal.multimodalFeatures(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "mime-dispatched encode→decode must fuse in one stage:\n" + p.take(1200))
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("cluster sample: centroids broadcast, quota draw is an object agg — never a corpus window") {
    val p = plan(Clustering.clusterSample(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // assignment attaches the k-centroid row via broadcast; the quota
    // draw must run as the map-side-combining typed aggregator, and NO
    // row_number window may touch the corpus (a k-partition window
    // would funnel everything through k reducers)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "expected the typed TopKAggregator:\n" + p.take(1200))
    assert(!p.contains("Window [row_number()"),
      "quota draw degenerated to a window rank:\n" + p.take(1200))
    // exactly three 1-row centroid-list attachments: the two Lloyd
    // assign passes and the final assignment — each a broadcast of a
    // single collected row, the documented acceptable BNLJ shape
    val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
    assert(bnlj == 3, s"unexpected nested-loop joins ($bnlj)")
  }

  test("curriculum: tercile cuts broadcast back; ranks only inside (epoch, shard) lanes") {
    val p = plan(Sampling.curriculumOrder(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // every row_number window is either the (epoch, shard) lane rank or
    // the 2-pass quantile machinery's hit-bucket selection (partitioned
    // by its g/b keys, touching only the two hit buckets' rows) — a
    // global or epoch-only window would serialize the corpus
    val winLines = p.split("\n").filter(_.contains("Window [row_number()"))
    assert(winLines.exists(l => l.contains("epoch") && l.contains("shard")),
      "missing the lane-partitioned rank window")
    winLines.foreach { l =>
      assert((l.contains("epoch") && l.contains("shard"))
          || l.contains("windowspecdefinition(g#"),
        s"window not lane- or bucket-partitioned:\n$l")
    }
  }
}
