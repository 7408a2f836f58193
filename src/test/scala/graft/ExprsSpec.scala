package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Unit + property tests for the scalar expression library (SURVEY.md §5
  * layer 1): F6 parse totality, D6 idempotence/pass-through, D13 split,
  * D12 checksum determinism. Generated inputs come straight from ScalaCheck
  * `Gen` (batched into one DataFrame per property for speed). */
class ExprsSpec extends SparkSuite {
  import spark.implicits._

  private def evalDesconto(s: String, base: Double): Double =
    Seq((s, base)).toDF("d", "b")
      .select(Exprs.parseDesconto(col("d"), col("b")).as("r"))
      .collect()(0).getDouble(0)

  test("F6: percent branch applies pct of base") {
    assert(evalDesconto("10%", 200.0) == 20.0)
  }
  test("F6: comma-decimal branch is an absolute amount") {
    assert(evalDesconto("15,5", 999.0) == 15.5)
  }
  test("F6: parse failure -> 0.0") {
    assert(evalDesconto("n/a", 100.0) == 0.0)
    assert(evalDesconto("", 100.0) == 0.0)
  }
  test("F6: negative values clamp to 0 (max(0,.) quirk)") {
    assert(evalDesconto("-5,0", 100.0) == 0.0)
    assert(evalDesconto("-10%", 100.0) == 0.0)
  }
  test("F6 property: any string yields a finite non-negative double") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.chooseNum(-100.0, 100.0).map(d => f"$d%.2f".replace('.', ',')),
      Gen.chooseNum(-100, 100).map(n => s"$n%"))
    val samples = Gen.listOfN(200, gen).sample.get
    val res = samples.toDF("d")
      .select(Exprs.parseDesconto(col("d"), lit(50.0)).as("r"))
      .collect().map(_.getDouble(0))
    assert(res.forall(r => !r.isNaN && !r.isInfinite && r >= 0.0))
  }

  test("gsumArray property: equals grouped gsum over the exploded rows") {
    // the one-pass fact builds rest on this equivalence: a per-row array
    // fold must land on exactly the grid sum an explode+groupBy computes —
    // including null elements (lenient-cast failures), which sum() skips
    val gen = Gen.listOfN(Gen.chooseNum(0, 12).sample.get,
      Gen.frequency(4 -> Gen.chooseNum(-1e6, 1e6).map(Option(_)),
        1 -> Gen.const(Option.empty[Double])))
    val rows = (1 to 120).map(i => (i.toLong, gen.sample.get))
    val df = rows.toDF("id", "xs")
      .unionByName(Seq(
        (9997L, Seq(Option.empty[Double], Option.empty[Double])), // all-null terms
        (9998L, Seq.empty[Option[Double]]),
        (9999L, null.asInstanceOf[Seq[Option[Double]]])).toDF("id", "xs"))
    val folded = df.select(col("id"),
      Exprs.gsumArray(col("xs"), x => x).as("s"))
    val grouped = df.select(col("id"), explode_outer(col("xs")).as("x"))
      .groupBy("id").agg(Exprs.gsum(col("x")).as("s"))
    val joined = folded.as("f").join(grouped.as("g"), "id")
      .filter(!(col("f.s") === col("g.s") ||
        (col("f.s").isNull && col("g.s").isNull)))
    assert(joined.count() == 0)
  }

  test("D6: valid dd/MM/yyyy normalizes to ISO") {
    val r = Seq("25/12/2023").toDF("d").select(Exprs.brDate(col("d"))).collect()(0).getString(0)
    assert(r == "2023-12-25")
  }
  test("D6: parse failure passes input through unchanged (reference quirk)") {
    val bad = Seq("oops", "", "2023-12-25")
    val res = bad.toDF("d").select(Exprs.brDate(col("d")).as("r")).collect().map(_.getString(0))
    assert(res(0) == "oops" && res(1) == "")
  }
  test("D6: idempotent on its own output") {
    val once = Seq("05/01/2024", "junk").toDF("d").select(Exprs.brDate(col("d")).as("r"))
    val twice = once.select(Exprs.brDate(col("r")).as("r2")).collect().map(_.getString(0))
    assert(twice.toSeq == Seq("2024-01-05", "junk"))
  }

  test("D13: category split principal/secundaria") {
    val df = Seq("A >> B", "Solo", "").toDF("c").select(
      Exprs.categoriaPrincipal(col("c")).as("p"),
      Exprs.categoriaSecundaria(col("c")).as("s"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("A", "B"), ("Solo", ""), ("", "")))
  }

  test("D12: checksum is deterministic and field-order-sensitive by contract") {
    val df = Seq(("x", "y")).toDF("a", "b").select(
      Exprs.canonicalChecksum(col("a"), col("b")).as("h1"),
      Exprs.canonicalChecksum(col("a"), col("b")).as("h2"),
      Exprs.canonicalChecksum(col("b"), col("a")).as("h3"))
    val r = df.collect()(0)
    assert(r.getString(0) == r.getString(1) && r.getString(0) != r.getString(2))
  }

  test("G1 helper: synthetic timestamp detection") {
    val r = Seq("20240101T000000", "20240101T123456").toDF("t")
      .select(Exprs.isSyntheticTs(col("t"))).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(true, false))
  }

  test("BPE delimited-replace application == naive greedy merge scan (exhaustive)") {
    // The tokenizer trainer applies a merge (l, r) by literal replace of
    // " l  r " with " lr " on the space-delimited symbol string. That is
    // only correct if non-overlapping left-to-right string replacement
    // equals the greedy symbol scan on EVERY sequence — including the
    // shared-delimiter traps ("a a a a" must merge twice, "a a a" once)
    // and merged symbols that are concatenations of other symbols
    // ("ab" vs "a","b"). Exhaustive over 4 symbols × length ≤ 5 × all 16
    // merge pairs, evaluated through Spark's actual `replace` expression.
    def naive(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    def enc(syms: List[String]): String = " " + syms.mkString("  ") + " "
    val alpha = List("a", "b", "ab", "_")
    val seqs = (1 to 5).flatMap(n =>
      List.fill(n)(alpha).flatten.combinations(n).flatMap(_.permutations))
      .distinct.toList
    val cases = for {
      s <- seqs; l <- alpha; r <- alpha
    } yield (enc(s), l, r, enc(naive(s, l, r)))
    val got = cases.map { case (e, l, r, _) => (e, l, r) }
      .toDF("s", "l", "r")
      .select(replace(col("s"),
        concat(lit(" "), col("l"), lit("  "), col("r"), lit(" ")),
        concat(lit(" "), col("l"), col("r"), lit(" "))).as("out"))
      .collect().map(_.getString(0))
    cases.zip(got).foreach { case ((e, l, r, want), g) =>
      assert(g == want, s"replace('$e', '$l','$r') = '$g', greedy = '$want'")
    }
  }

  test("adjacent_grams == the transform/slice HOF it replaced, k=2 and k=3") {
    // exhaustive over array lengths 0..6 (incl. empty-string tokens: the
    // clamped trailing gram and the single-token case are the traps),
    // evaluated through Spark so codegen AND interpreted paths both run.
    // The n=0 guard below is not masking a gap — it encodes the DOCUMENTED
    // divergence (AdjacentGrams.scala): the kernel returns [] for an empty
    // token array where the raw HOF's sequence(1, greatest(...,1)) floor
    // would fabricate [''] — unreachable from split(), deliberate here
    val arrays: Seq[Seq[String]] =
      (0 to 6).map(n => (1 to n).map(i => s"t$i")) :+
        Seq("", "a", "") :+ Seq("x") :+ Seq("", "")
    val df = arrays.toDF("words")
    Seq(2, 3).foreach { k =>
      val hof = expr(
        s"transform(sequence(1, greatest(size(words) - ${k - 1}, 1)), " +
          s"i -> concat_ws(' ', slice(words, i, $k)))")
      val rows = df.select(
        call_function("adjacent_grams", col("words"), lit(k)).as("fast"),
        when(size(col("words")) > 0, hof)
          .otherwise(expr("array()")).as("ref"))
        .collect()
      arrays.zip(rows).foreach { case (in, r) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k mismatch on $in: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("greedy_pieces: longest-match-first, char fallback, empty word") {
    val vocab = typedlit(Seq("ab", "abc", "c", "d", "a", "b"))
    val df = Seq("abcd", "abca", "xabc", "").toDF("w")
      .select(col("w"),
        call_function("greedy_pieces", col("w"), vocab).as("ps"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // 'abc' (len 3) beats 'ab' (len 2) at position 0 — longest-first
    assert(got("abcd") == Seq("abc", "d"))
    assert(got("abca") == Seq("abc", "a"))
    // 'x' is not in the vocabulary: the single-char fallback emits it
    // verbatim rather than failing the row
    assert(got("xabc") == Seq("x", "abc"))
    assert(got("") == Seq())
    // codegen and interpreted paths agree (the DataFrame run above is
    // codegen; evaluate the expression directly for the interpreted path)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.plans.GreedyPieces(Literal("abcd"),
      Literal.create(Seq("ab", "abc", "c", "d", "a", "b"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    val r = expr.eval(null).asInstanceOf[ArrayData]
    assert((0 until r.numElements()).map(r.getUTF8String(_).toString) ==
      Seq("abc", "d"))
  }

  test("adjacent_grams refuses null tokens (containsNull=false is enforced)") {
    // dataType promises containsNull = false; a null token would otherwise
    // flow through UTF8String.concat into a no-null array — UB downstream.
    // Both the interpreted and codegen paths must throw, not corrupt.
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("words")
      .select(array(col("words").getItem(0), lit(null).cast("string"),
        col("words").getItem(1)).as("words"))
    val e = intercept[Exception] {
      df.select(call_function("adjacent_grams", col("words"), lit(2)))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
    assert(rootMsg(e).contains("null token"), s"unexpected failure: $e")
  }
}
