package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** One cell of a [[NearestInCodebook]] codebook: parallel (id, flat
  * vector block) arrays, ids sorted ASCENDING — the fold visits them in
  * id order, so a strict `>` on the rounded dot reproduces the
  * `max_by(struct(round(dot, 6), -id))` tiebreak (highest dot, lowest
  * id) exactly. */
final class CellBook(val ids: Array[Long], val flat: Array[Double], val dim: Int)
  extends Serializable {
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "CellBook ids must be strictly ascending")
  require(flat.length == ids.length * dim, "flat block must be ids x dim")
  override def equals(o: Any): Boolean = o match {
    case c: CellBook => dim == c.dim && java.util.Arrays.equals(ids, c.ids) &&
      java.util.Arrays.equals(flat, c.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(ids) * 31 + java.util.Arrays.hashCode(flat)
}

/** Codegen'd nearest-centroid assignment: for a row's (cell, vector),
  * return the id of the codebook entry in that cell with the highest
  * `round(dot, 6)` (lowest id on ties — the exact ordering the former
  * join + `max_by` plan used, so every IVF oracle stays hash-identical).
  *
  * Why an expression and not a join: the join + hash-aggregate shape
  * materializes n × |cell codebook| candidate rows, each CARRYING the
  * 64-double vector, through `max_by` — measured 217 s for 500 k
  * vectors × 489 centroids, i.e. hours at the multi-million-vector
  * corpora the IVF ceiling probe targets. This expression is one
  * projection over the corpus: per row, a fused dot-argmax loop over
  * the (bounded, ≤ 4096 × dim doubles per cell) codebook held as a
  * plan reference object. No shuffle, no candidate materialization,
  * stays inside WholeStageCodegen.
  *
  * The flat single-codebook case passes cell = lit(0); the two-level
  * within-cell case passes the row's coarse cell id. A cell with no
  * codebook entries yields NULL (cannot happen for books built from
  * the assignment itself; NULL is the safe contract anyway). */
case class NearestInCodebook(left: Expression, right: Expression,
    books: java.util.HashMap[java.lang.Long, CellBook]) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(cell: Any, vec: Any): Any = {
    val r = NearestInCodebook.nearest(books, cell.asInstanceOf[Long],
      vec.asInstanceOf[ArrayData])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "java.util.HashMap")
    val code = nullSafeCodeGen(ctx, ev, (c, v) => {
      s"""
         |${ev.value} = graft.functions.NearestInCodebook.nearest($booksRef, $c, $v);
         |if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
       """.stripMargin
    })
    code
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_in_codebook"
}

object NearestInCodebook {
  /** Spark's Round(HALF_UP-over-shortest-decimal) semantics, verbatim:
    * both the former plan and the oracle rank on round(dot, 6), so the
    * argmax must compare the SAME rounded values. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Long.MinValue = no codebook for this cell (mapped to NULL). */
  def nearest(books: java.util.HashMap[java.lang.Long, CellBook],
      cell: Long, vec: ArrayData): Long = {
    val b = books.get(cell)
    if (b == null || b.ids.length == 0) return Long.MinValue
    val n = math.min(b.dim, vec.numElements())
    var bestId = Long.MinValue
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < b.ids.length) {
      var dot = 0.0
      var i = 0
      val off = j * b.dim
      while (i < n) { dot += vec.getDouble(i) * b.flat(off + i); i += 1 }
      val r = round6(dot)
      // Double.compare, not '>': the former join+max_by plan (and
      // DuckDB's ORDER BY) use total ordering with NaN as GREATEST, so
      // a NaN dot (possible if a sub-centroid mean is the zero vector
      // and unitVec yields NaN components) must win here too, wherever
      // it appears in the codebook — strict '>' would only ever select
      // it at index 0.
      if (bestId == Long.MinValue || java.lang.Double.compare(r, bestDot) > 0) {
        bestDot = r; bestId = b.ids(j)
      }
      j += 1
    }
    bestId
  }
}

object CodebookFunctions {
  /** Build the single-cell (flat) codebook map: cell 0 holds every
    * entry. */
  def flatBook(entries: Seq[(Long, Array[Double])], dim: Int)
      : java.util.HashMap[java.lang.Long, CellBook] = {
    val m = new java.util.HashMap[java.lang.Long, CellBook]()
    m.put(0L, cellBookOf(entries, dim))
    m
  }

  /** Build a per-cell codebook map from (cell, id, vector) entries. */
  def cellBooks(entries: Seq[(Long, Long, Array[Double])], dim: Int)
      : java.util.HashMap[java.lang.Long, CellBook] = {
    val m = new java.util.HashMap[java.lang.Long, CellBook]()
    entries.groupBy(_._1).foreach { case (cell, es) =>
      m.put(cell, cellBookOf(es.map(e => (e._2, e._3)), dim))
    }
    m
  }

  private def cellBookOf(entries: Seq[(Long, Array[Double])], dim: Int): CellBook = {
    val sorted = entries.sortBy(_._1)
    new CellBook(sorted.map(_._1).toArray, sorted.flatMap(_._2).toArray, dim)
  }

  def nearestInCodebook(cell: Column, vec: Column,
      books: java.util.HashMap[java.lang.Long, CellBook]): Column =
    Bridge.column(NearestInCodebook(Bridge.expression(cell), Bridge.expression(vec), books))
}
