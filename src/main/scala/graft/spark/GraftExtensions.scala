package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the frontier's native
  * Catalyst expressions ([[FrontierExprs]]) in the SQL function registry
  * so plain-SQL users (spark-sql, Thrift server, `spark.sql(...)`)
  * reach the same codegen kernels as the Scala column API — no UDF
  * fallback, identical semantics.
  *
  * Wire it at deploy time:
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.spark.GraftExtensions ...
  * }}}
  * or in code: `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * The registered surface is the reference's URL/hash kernel set
  * (`frontera/utils/fingerprint.py`, `utils/url.py`,
  * `contrib/backends/partitioners.py`, discovery robots helpers) —
  * see each expression's Scaladoc for the exact parity contract.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)

  private def unary(name: String, cls: Class[_], f: Expression => Expression) =
    (new FunctionIdentifier(name), info(name, cls),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        f(args.head)
      })

  private def binary(name: String, cls: Class[_],
      f: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name), info(name, cls),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        f(args(0), args(1))
      })

  /** Every registry-safe frontier expression (BloomSeenProbe is omitted:
    * it closes over a broadcast object and has no literal-only form). */
  val descriptions = Seq(
    unary("graft_canonicalize_url", classOf[CanonicalizeUrl], CanonicalizeUrl),
    unary("graft_url_fingerprint", classOf[UrlFingerprint], UrlFingerprint),
    unary("graft_hostname_local_fp", classOf[HostnameLocalFingerprint],
      HostnameLocalFingerprint),
    unary("graft_url_host", classOf[UrlHost], UrlHost),
    unary("graft_sld", classOf[Sld], Sld),
    unary("graft_is_home_page", classOf[IsHomePage], IsHomePage),
    unary("graft_signed_crc32", classOf[SignedCrc32], SignedCrc32),
    unary("graft_seen_key", classOf[SeenKey], SeenKey),
    unary("graft_robots_valid", classOf[RobotsValid], RobotsValid),
    binary("graft_host_partition", classOf[HostPartition], HostPartition.apply),
    binary("graft_robots_can_fetch", classOf[RobotsCanFetch], RobotsCanFetch.apply))
}
