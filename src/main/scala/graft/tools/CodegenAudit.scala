package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Codegen health audit for one or more registered queries: compiles
  * every WholeStageCodegen subtree of the executed plan and prints its
  * max generated-method bytecode size plus the optimized plan's
  * expression-node count. The two numbers that caught (and now guard
  * against, see PlanSpec) the round-4 q38 regression: a method over
  * ~8 KiB bytecode is never JIT-compiled (HotSpot DontCompileHugeMethods
  * limit), one over spark.sql.codegen.hugeMethodLimit makes Spark drop
  * the whole stage to interpreted execution.
  *
  * Usage: sbt "runMain graft.tools.CodegenAudit q38 [q39 ...]" — query
  * name prefixes; env SPARK_GRAFT_SF_DIR picks the data (default
  * sf0.01).
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val prefixes = if (args.isEmpty) Seq("q38") else args.toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        df.collect() // finalize the AQE plan before compiling subtrees
        val nExpr = df.queryExecution.optimizedPlan
          .map(node => node.expressions.map(e => e.collect { case x => x }.size).sum).sum
        println(s"[audit] $name optimized-plan expression nodes: $nExpr")
        import org.apache.spark.sql.execution.debug._
        codegenStringSeq(df.queryExecution.executedPlan).zipWithIndex.foreach {
          case ((subtree, _, stats), i) =>
            val head = subtree.linesIterator.filter(_.nonEmpty).take(4).mkString(" | ")
            println(s"[audit] $name subtree#$i maxMethod=${stats.maxMethodCodeSize} " +
              s"constPool=${stats.maxConstPoolSize} inner=${stats.numInnerClasses} :: $head")
        }
      }
    spark.stop()
  }
}
