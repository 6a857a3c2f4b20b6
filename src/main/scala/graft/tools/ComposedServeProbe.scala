package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Attributes the q162 warm-serve gap: the composed PQ artifact served
  * 35 s warm at the 100× corpus where q141's incremental artifact
  * serves 13.5 s and q139's monolithic one 5 s — same row counts, same
  * probe plan. This probe times each gate's build (sample 1) and two
  * warm serves, then reports the cached codes/vectors partition counts
  * per artifact, so "the artifact's physical layout serializes the
  * scan" is measured rather than guessed.
  *
  *   sbt "runMain graft.tools.ComposedServeProbe /tmp/scale100x"
  */
object ComposedServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def partsOf(indexDir: String): Unit = {
      val codes = spark.read.parquet(s"$indexDir/codes")
      val vecs = spark.read.parquet(s"$indexDir/vectors")
      println(s"[probe]   codes rows=${codes.count()} parts=${codes.rdd.getNumPartitions} " +
        s"vectors rows=${vecs.count()} parts=${vecs.rdd.getNumPartitions}")
    }

    for (s <- 1 to 2) time(s"q139 sample$s")(Similarity.pqTopKPersisted(spark, dir).collect())
    Similarity.persistedPqDirFor(spark, dir).foreach(partsOf)
    for (s <- 1 to 2) time(s"q162 sample$s")(Similarity.pqComposed(spark, dir).collect())
    Similarity.persistedPqComposedDirFor(spark, dir).foreach(partsOf)
    time("q141 build+serve")(Similarity.pqIncremental(spark, dir).collect())
    // order-swap: q162's artifact FIRST — if the cost follows the order
    // rather than the artifact, the JVM (codegen churn), not the data,
    // is the suspect
    for {
      (label, idx) <- Seq(
        "q162" -> Similarity.persistedPqComposedDirFor(spark, dir),
        "q141" -> Similarity.persistedPqIncrementalDirFor(spark, dir),
        "q162b" -> Similarity.persistedPqComposedDirFor(spark, dir),
        "q139" -> Similarity.persistedPqDirFor(spark, dir))
      indexDir <- idx
    } {
      import org.apache.spark.sql.functions._
      val codes = spark.read.parquet(s"$indexDir/codes")
      val hist = codes.groupBy("cent_id", "sub_id").count()
        .orderBy(desc("count")).collect()
      println(s"[probe] $label lists=${hist.length} " +
        s"top=${hist.take(4).map(r => r.getLong(2)).mkString(",")} " +
        s"min=${hist.lastOption.map(_.getLong(2)).getOrElse(-1L)}")
      // ADC candidate volume: probed lists joined to codes (the serve's
      // fan-out stage), counted without the scoring expression
      val vectors = spark.read.parquet(s"$indexDir/vectors")
      val coarse = spark.read.parquet(s"$indexDir/coarse")
      val sub = spark.read.parquet(s"$indexDir/subcents")
      val qs = vectors.where(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("u").as("qu"))
      val probes = Similarity.probedListsForProbe(coarse, sub, qs, 4, 2)
      val t0 = System.nanoTime()
      val nCand = probes.join(codes.select(col("vec_id"),
          col("cent_id").cast("long").as("cent_id"), col("sub_id")),
        Seq("cent_id", "sub_id")).count()
      println(f"[probe] $label adc candidates=$nCand (join count in ${(System.nanoTime()-t0)/1e9}%.2f s)")
      println(s"[probe] $label codes schema: ${codes.schema.simpleString}")
      println(s"[probe] $label vectors schema: ${vectors.schema.simpleString}")
      // the scoring stage alone: ADC expression + top-rerank window
      val book = Similarity.readPqBookForProbe(spark, indexDir)
      val codesTyped = codes.select(col("vec_id"),
        col("cent_id").cast("long").as("cent_id"), col("sub_id"),
        col("proj"), col("codes"))
      val adc = probes.join(codesTyped, Seq("cent_id", "sub_id"))
        .where(col("vec_id") =!= col("q_id"))
        .join(broadcast(sub), Seq("cent_id", "sub_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          (col("proj") * graft.functions.VectorFunctions.dotProduct(col("qu"), col("scu")) +
            graft.functions.CodebookFunctions.pqAdcMicros(col("qu"), col("codes"), book) /
              lit(1e6)).as("adc"))
      val t1 = System.nanoTime()
      val nScored = adc.count()
      println(f"[probe] $label adc scored=$nScored in ${(System.nanoTime()-t1)/1e9}%.2f s")
      // the exact serve stages: top-rerank window, then the rerank join
      val aw = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(round(col("adc"), 6).desc, col("neighbor_id"))
      val short = adc.withColumn("arn", row_number().over(aw))
        .where(col("arn") <= 16)
        .select(col("q_id"), col("neighbor_id"))
      // task-level attribution: stage ids, task counts, max/sum task time
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = t.taskInfo.duration
          stages.merge(t.stageId, (1, d, d), (a, b) =>
            (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t2 = System.nanoTime()
      val nShort = short.count()
      println(f"[probe] $label window shortlist=$nShort in ${(System.nanoTime()-t2)/1e9}%.2f s")
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._2).take(5).foreach { case (sid, (n, sum, mx)) =>
        println(f"[probe] $label   stage $sid: tasks=$n sumMs=$sum maxMs=$mx")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_window_$label.txt"),
        short.queryExecution.executedPlan.toString)
      // join-output rows per (cent_id, sub_id) shuffle bucket — the
      // scoring stage's actual task-level distribution
      val perBucket = probes.join(codesTyped, Seq("cent_id", "sub_id"))
        .groupBy(pmod(hash(col("cent_id"), col("sub_id")), lit(32)).as("bucket"))
        .count().orderBy(desc("count")).collect()
      println(s"[probe] $label buckets=${perBucket.length} " +
        s"rows=${perBucket.map(_.getLong(1)).sum} " +
        s"top=${perBucket.take(5).map(_.getLong(1)).mkString(",")}")
      val qsB = qs
      val scored = short.join(broadcast(qsB), Seq("q_id"))
        .join(vectors.select(col("vec_id").as("neighbor_id"), col("u").as("nu")),
          Seq("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"),
          graft.functions.VectorFunctions.dotProduct(col("qu"), col("nu")).as("cos"))
      val t3 = System.nanoTime()
      val nFinal = scored.count()
      println(f"[probe] $label rerank scored=$nFinal in ${(System.nanoTime()-t3)/1e9}%.2f s")
      val t4 = System.nanoTime()
      Similarity.pqTopKFromIndexCold(spark, indexDir).collect()
      println(f"[probe] $label full cold serve in ${(System.nanoTime()-t4)/1e9}%.2f s")
    }
    spark.stop()
  }
}
