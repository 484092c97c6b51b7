package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off: measure s12 floors at sf0.001 (spec fixture) and on the
  * clustered corpus SimilaritySpec uses for the IVF regime test. */
object PqProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dotc = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorOps.dotProduct(a, b)

    // --- shipped entry at sf0.001 vs s01 exact ---
    val d = "/root/testdata/sf0.001"
    val exact = operators.Similarity.s01CosineTopK(spark, d)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val got = operators.Similarity.s12PqTopK(spark, d)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rec = exact.keys.toSeq.map(q => (exact(q) & got.getOrElse(q, Set.empty)).size / 3.0)
    println(f"[sf0.001] recall@3=${rec.sum / rec.size}%.3f nq=${got.size}")

    // --- ADC error + separation at sf0.001 ---
    val c = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val vn = c.withColumn("nrm", graft.functions.VectorOps.l2Norm($"v"))
      .select($"vec_id", transform($"v", x => x / $"nrm").as("vn"))
    val qq = vn.filter($"vec_id" < 20).select($"vec_id".as("q_id"), $"vn".as("qn"))
    val truth = vn.crossJoin(broadcast(qq)).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        (lit(2.0) - lit(2.0) * dotc($"vn", $"qn")).as("true_d2"))
    val sv = operators.Similarity.pqSubvectors(c, 8).cache()
    val books = operators.Similarity.trainedPqCodebooks(spark, d, 8, 16, 2)
    val dtab = sv.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"sub", $"sv".as("qsv"))
      .join(broadcast(books), Seq("sub"))
      .select($"q_id", $"sub", $"cid",
        round(dotc($"qsv", $"qsv") - lit(2.0) * dotc($"qsv", $"cv") + dotc($"cv", $"cv"), 6).as("d2q"))
    val adc = operators.Similarity.pqCodes(sv, books)
      .select($"vec_id".as("n_id"), posexplode($"codes")).toDF("n_id", "sub", "cid")
      .join(broadcast(dtab), Seq("sub", "cid"))
      .filter($"n_id" =!= $"q_id")
      .groupBy($"q_id", $"n_id").agg(graft.Det.dsum($"d2q").as("adc")).cache()
    val err = truth.join(adc, Seq("q_id", "n_id"))
      .agg(avg(abs($"adc" - $"true_d2")), max(abs($"adc" - $"true_d2"))).collect().head
    val pairs = operators.Similarity.s02EmbeddingNearDup(spark, d)
      .select($"a_id".as("q_id"), $"b_id".as("n_id"))
    val pairAdc = adc.join(pairs, Seq("q_id", "n_id")).agg(avg($"adc")).collect().head
    val overall = adc.agg(avg($"adc")).collect().head.getDouble(0)
    println(f"[sf0.001] mae=${err.getDouble(0)}%.4f maxe=${err.getDouble(1)}%.4f " +
      f"pairADC=${if (pairAdc.isNullAt(0)) "n/a" else f"${pairAdc.getDouble(0)}%.4f"} overall=$overall%.4f")

    // --- alternative configs at sf0.001 (entry-equivalent pipeline) ---
    for ((dsub2, kk, iters) <- Seq((4, 16, 3), (2, 16, 3))) {
      val sv2 = operators.Similarity.pqSubvectors(c, dsub2).cache()
      val books2 = operators.Similarity.pqCodebooks(sv2, kk, iters)
      val dtab2 = sv2.filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"sub", $"sv".as("qsv"))
        .join(broadcast(books2), Seq("sub"))
        .select($"q_id", $"sub", $"cid",
          round(dotc($"qsv", $"qsv") - lit(2.0) * dotc($"qsv", $"cv") + dotc($"cv", $"cv"), 6).as("d2q"))
      val wa2 = Window.partitionBy($"q_id").orderBy($"adc".asc, $"n_id".asc)
      val got2 = operators.Similarity.pqCodes(sv2, books2)
        .select($"vec_id".as("n_id"), posexplode($"codes")).toDF("n_id", "sub", "cid")
        .join(broadcast(dtab2), Seq("sub", "cid"))
        .filter($"n_id" =!= $"q_id")
        .groupBy($"q_id", $"n_id").agg(graft.Det.dsum($"d2q").as("adc"))
        .withColumn("rk", row_number().over(wa2)).filter($"rk" <= 3)
        .select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val rec2 = exact.keys.toSeq.map(q => (exact(q) & got2.getOrElse(q, Set.empty)).size / 3.0)
      println(f"[sf0.001-alt] dsub=$dsub2 K=$kk iters=$iters recall@3=${rec2.sum / rec2.size}%.3f")
      sv2.unpersist()
    }

    // --- clustered corpus (the SimilaritySpec s10 fixture) ---
    val dim = 16; val groups = 8; val perGroup = 25
    val rows = for { g <- 0 until groups; i <- 0 until perGroup } yield {
      val v = Array.tabulate(dim) { j =>
        val base = if (j == 2 * g || j == 2 * g + 1) 1.0 else 0.0
        base + (((i * 31 + j * 17) % 7) - 3) * 0.03
      }
      (g.toLong + groups.toLong * i, v)
    }
    val vecs = rows.toDF("vec_id", "v")
    val vn2 = vecs.withColumn("nrm", graft.functions.VectorOps.l2Norm($"v"))
      .select($"vec_id", transform($"v", x => x / $"nrm").as("vn"))
    val qq2 = vn2.select($"vec_id".as("q_id"), $"vn".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"d2".asc, $"n_id".asc)
    val exactC = vn2.crossJoin(qq2).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        (lit(2.0) - lit(2.0) * dotc($"vn", $"qn")).as("d2"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    for ((dsub, kk, iters) <- Seq((2, 16, 2), (2, 16, 3), (4, 16, 3))) {
      val svc = operators.Similarity.pqSubvectors(vecs, dsub).cache()
      val booksC = operators.Similarity.pqCodebooks(svc, kk, iters)
      val dtabC = svc.select($"vec_id".as("q_id"), $"sub", $"sv".as("qsv"))
        .join(broadcast(booksC), Seq("sub"))
        .select($"q_id", $"sub", $"cid",
          round(dotc($"qsv", $"qsv") - lit(2.0) * dotc($"qsv", $"cv") + dotc($"cv", $"cv"), 6).as("d2q"))
      val wa = Window.partitionBy($"q_id").orderBy($"adc".asc, $"n_id".asc)
      val gotC = operators.Similarity.pqCodes(svc, booksC)
        .select($"vec_id".as("n_id"), posexplode($"codes")).toDF("n_id", "sub", "cid")
        .join(dtabC, Seq("sub", "cid"))
        .filter($"n_id" =!= $"q_id")
        .groupBy($"q_id", $"n_id").agg(graft.Det.dsum($"d2q").as("adc"))
        .withColumn("rk", row_number().over(wa)).filter($"rk" <= 3)
        .select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val recC = exactC.keys.toSeq.map(q => (exactC(q) & gotC.getOrElse(q, Set.empty)).size / 3.0)
      println(f"[clustered] dsub=$dsub K=$kk iters=$iters recall@3=${recC.sum / recC.size}%.3f")
      svc.unpersist()
    }
    spark.stop()
  }
}
