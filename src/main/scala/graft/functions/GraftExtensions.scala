package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `GraftExtensions` via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) — cluster-wide, survives
  *    new sessions;
  *  - `GraftFunctions.register(spark)` — per-session temp functions for an
  *    already-built session.
  *
  * After either: `SELECT cosine_sim(a.embedding, b.embedding)`,
  * `simhash64(tokens)`, `jaccard_sorted(x, y)`,
  * `hashed_shingle_set(tokens, 3)` work in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def stringArrayArg(e: Expression, what: String): Array[String] =
    if (!e.foldable) throw new IllegalArgumentException(s"$what must be a foldable array<string>")
    else e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType).map {
          case null => throw new IllegalArgumentException(
            s"$what must not contain NULL elements")
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"$what must be an array<string>, found element $other")
        }
      case other => throw new IllegalArgumentException(s"$what must be an array<string>, got $other")
    }

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "cosine_sim" -> (
      new ExpressionInfo(classOf[Native.CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => Native.CosineSimilarity(es(0), es(1))),
    "simhash64" -> (
      new ExpressionInfo(classOf[Native.SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => Native.SimHash64(es.head)),
    "simhash_portable" -> (
      new ExpressionInfo(classOf[Native.SimHashPortable].getName, "simhash_portable"),
      (es: Seq[Expression]) => Native.SimHashPortable(es.head)),
    "jaccard_sorted" -> (
      new ExpressionInfo(classOf[Native.JaccardSortedLongs].getName, "jaccard_sorted"),
      (es: Seq[Expression]) => Native.JaccardSortedLongs(es(0), es(1))),
    "hashed_shingle_set" -> (
      new ExpressionInfo(classOf[Native.HashedShingleSet].getName, "hashed_shingle_set"),
      (es: Seq[Expression]) => Native.HashedShingleSet(es(0), intArg(es(1), "k"))),
    "shingle_minhash" -> (
      new ExpressionInfo(classOf[Native.ShingleMinHash].getName, "shingle_minhash"),
      (es: Seq[Expression]) => {
        val fam = graft.scale.Shingling.HashFamily(
          numHashes = intArg(es(2), "numHashes"),
          seed = es.lift(3).map(intArg(_, "seed").toLong).getOrElse(42L))
        Native.ShingleMinHash(es(0), intArg(es(1), "k"),
          fam.coeffs.map(_._1).toArray, fam.coeffs.map(_._2).toArray)
      }),
    "l2_normalize" -> (
      new ExpressionInfo(classOf[Native.L2Normalize].getName, "l2_normalize"),
      (es: Seq[Expression]) => Native.L2Normalize(es.head)),
    // bpe_stats(text, array(lefts...), array(rights...)) /
    // bpe_tokens(...): native greedy BPE application with a literal
    // merge table (rank = array position)
    "bpe_stats" -> (
      new ExpressionInfo(classOf[Bpe.BpeStats].getName, "bpe_stats"),
      (es: Seq[Expression]) => Bpe.BpeStats(es(0),
        stringArrayArg(es(1), "lefts"), stringArrayArg(es(2), "rights"))),
    "bpe_tokens" -> (
      new ExpressionInfo(classOf[Bpe.BpeTokens].getName, "bpe_tokens"),
      (es: Seq[Expression]) => Bpe.BpeTokens(es(0),
        stringArrayArg(es(1), "lefts"), stringArrayArg(es(2), "rights"))),
    "normalize_nfc" -> (
      new ExpressionInfo(classOf[Native.NormalizeNfc].getName, "normalize_nfc"),
      (es: Seq[Expression]) => Native.NormalizeNfc(es.head)),
    // aggregates: SELECT g, bounded_top_k(v, w, 5) ... GROUP BY g
    "bounded_top_k" -> (
      new ExpressionInfo(classOf[Aggregates.BoundedTopK].getName, "bounded_top_k"),
      (es: Seq[Expression]) => Aggregates.BoundedTopK(es(0), es(1), intArg(es(2), "k"))),
    // bounded_top_k_double(v, w, k[, ascending]) — double weight, the
    // distance/similarity shape; ascending=true keeps the k SMALLEST
    // weights (distance), default false keeps the largest, matching
    // bounded_top_k's ordering
    "bounded_top_k_double" -> (
      new ExpressionInfo(classOf[Aggregates.BoundedTopKDouble].getName, "bounded_top_k_double"),
      (es: Seq[Expression]) => Aggregates.BoundedTopKDouble(es(0), es(1),
        intArg(es(2), "k"),
        ascending = es.lift(3).map {
          case Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"ascending must be a boolean literal, got $other")
        }.getOrElse(false))),
    "space_saving_top_k" -> (
      new ExpressionInfo(classOf[Aggregates.SpaceSavingTopK].getName, "space_saving_top_k"),
      (es: Seq[Expression]) => Aggregates.SpaceSavingTopK(es(0),
        outputK = intArg(es(1), "outputK"),
        capacity = es.lift(2).map(intArg(_, "capacity")).getOrElse(4096))),
    "weighted_quantile_sketch" -> (
      new ExpressionInfo(classOf[Aggregates.WeightedQuantileSketch].getName, "weighted_quantile_sketch"),
      (es: Seq[Expression]) => {
        val q = es(2) match {
          case Literal(v: Double, _) => v
          // plain SQL `0.5` parses as a DECIMAL literal, whose value
          // class is Spark's own Decimal (not java.math.BigDecimal)
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble // q = 0 / 1
          case other => throw new IllegalArgumentException(
            s"q must be a numeric literal, got $other")
        }
        Aggregates.WeightedQuantileSketch(es(0), es(1), q,
          es.lift(3).map(intArg(_, "capacity")).getOrElse(4096))
      }))

  /** Register all functions as session temp functions. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
