package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Primary-key join elimination — the constraint-driven rewrite every
  * commercial warehouse ships and Spark does not: a LEFT OUTER equi-join
  * against a dimension whose join key is DECLARED UNIQUE is a no-op when
  * the query reads no dimension columns — left-outer preserves every left
  * row, and uniqueness means no fan-out — so the join (and the dim scan,
  * and its shuffle/broadcast) can be dropped entirely.
  *
  * This situation is not hypothetical: wide BI views join every dimension
  * up front and each dashboard query touches two or three of them. With
  * the view defined over LEFT OUTER joins (the standard contract exactly
  * because it makes this rewrite sound), the registered uniqueness turns
  * the untouched dimensions into free no-ops at 100 TB.
  *
  * Scope: LEFT OUTER + single-column key equality, dimension on the right
  * as a (possibly column-pruned) parquet scan. Uniqueness is declared per
  * table path via [[register]] — validate it first with
  * [[graft.ops.Expectations.primaryKeyViolations]]. INNER-join
  * elimination additionally needs referential integrity + a non-null FK;
  * rewriting the join to LEFT OUTER at view-definition time is the
  * simpler, safer contract, so inner elimination is deliberately out of
  * scope. Registration is driver-local (same pattern as
  * [[AggRollupRewrite]]).
  */
object JoinEliminationRewrite extends Rule[LogicalPlan] {

  private val registry = TrieMap.empty[String, Set[String]]

  /** Canonicalize to the FULL qualified URI (scheme + authority + path):
    * keying by path alone would let a registration for one filesystem or
    * bucket match a same-pathed table on another, silently eliminating a
    * join against a table that may hold duplicate keys. */
  private def canon(p: String, conf: org.apache.hadoop.conf.Configuration): String = {
    val path = new Path(p)
    path.getFileSystem(conf).makeQualified(path).toString
  }

  /** Declare `column` unique in the parquet table at `path`. */
  def register(spark: SparkSession, path: String, column: String): Unit = {
    val key = canon(path, spark.sessionState.newHadoopConf())
    registry.put(key, registry.getOrElse(key, Set.empty) + column)
  }

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      case p @ Project(_, j: Join) =>
        eliminate(p, j).getOrElse(p)
    }

  private def eliminate(p: Project, j: Join): Option[LogicalPlan] = {
    if (j.joinType != LeftOuter) return None
    // the projection must not touch the dimension side
    if (!p.references.subsetOf(j.left.outputSet)) return None
    val (lk, rk) = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) (a, b)
        else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a)) (b, a)
        else return None
      case _ => return None
    }
    if (!uniqueIn(j.right, rk)) return None
    Some(Project(p.projectList, j.left))
  }

  /** Is `key` a registered unique column of the (possibly pruned) scan?
    * Skips the `IsNotNull(key)` filter InferFiltersFromConstraints puts on
    * the dim side — null-keyed dim rows never equi-match, so their
    * presence or absence cannot change which left rows find a partner. */
  private def uniqueIn(side: LogicalPlan, key: Attribute): Boolean = side match {
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
      uniqueIn(child, key)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(
        org.apache.spark.sql.catalyst.expressions.IsNotNull(a: AttributeReference), child)
        if a.semanticEquals(key) =>
      uniqueIn(child, key)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.toList match {
            case single :: Nil =>
              val conf = SparkSession.active.sessionState.newHadoopConf()
              registry.get(canon(single.toString, conf)).exists(_.contains(key.name))
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }
}
