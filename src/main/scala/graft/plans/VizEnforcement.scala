package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.VizVisible

/**
 * Session-level visibility enforcement — the Spark analog of the reference's
 * non-bypassable scan-time visibility filtering (Accumulo evaluates
 * ColumnVisibility inside every scan; the cache applies an explicit
 * VisibilityFilter — reference server/src/main/java/timely/server/store/cache/
 * VisibilityFilter.java:1-39, auth lookup DataStore.java:1045-1047).
 *
 * Registered through `SparkSessionExtensions`: every scan of a relation that
 * carries a `viz` column gets wrapped in `Filter(viz_visible(viz, auths))`
 * during resolution, where `auths` comes from the session conf
 * `spark.graft.auths`. User code cannot forget (or choose not) to filter —
 * the rule fires on the logical plan itself.
 *
 * Enable with:
 * {{{
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)
 *     .config("spark.graft.viz.enforce", "true")
 *     .config("spark.graft.auths", "A,B")
 * }}}
 */
object VizEnforcement {
  /** Marks relations already wrapped, so reanalysis doesn't stack filters. */
  private[plans] val Injected = TreeNodeTag[Boolean]("graft.viz.injected")

  val EnforceConf = "spark.graft.viz.enforce"
  val AuthsConf = "spark.graft.auths"
}

class VizEnforcementRule extends Rule[LogicalPlan] {

  import VizEnforcement._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enforce = conf.getConfString(EnforceConf, "false").toBoolean
    if (!enforce) return plan
    val auths = conf.getConfString(AuthsConf, "")
    plan.transformUp {
      case r: LogicalRelation if wants(r) => wrap(r, auths)
      case r: DataSourceV2Relation if wants(r) => wrap(r, auths)
    }
  }

  private def wants(r: LogicalPlan): Boolean =
    r.getTagValue(Injected).isEmpty && r.output.exists(_.name == "viz")

  private def wrap(r: LogicalPlan, auths: String): LogicalPlan = {
    r.setTagValue(Injected, true)
    val vizAttr = r.output.find(_.name == "viz").get
    Filter(VizVisible(vizAttr, Literal(UTF8String.fromString(auths), org.apache.spark.sql.types.StringType)), r)
  }
}

/** Extension entry point: `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => new VizEnforcementRule)
    // SQL-callable visibility check: SELECT ... WHERE viz_visible(viz, 'A,B')
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("viz_visible"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VizVisible].getName, "viz_visible"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "viz_visible(viz, auths_csv)")
        VizVisible(children.head, children(1))
      }))
  }
}
