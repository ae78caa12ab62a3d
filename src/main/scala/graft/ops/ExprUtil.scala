package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object ExprUtil {

  /** Bind an (expensive) array expression to a lambda variable so the body
    * evaluates it exactly once per row.
    *
    * Higher-order functions are excluded from Spark's subexpression
    * elimination inside lambda bodies: an expression referenced via
    * `element_at(expensive, i)` inside a `transform` lambda is re-evaluated
    * on every element access — for a hash array accessed k times per
    * output element that is a k·n× blowup. Lambda VARIABLES, by contrast,
    * are evaluated once. `bound(e)(f)` rewrites `f(e)` as
    * `transform(array(e), v => f(v))[1]`, turning the expression into a
    * bound variable.
    */
  def bound(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), v => f(v)), 1)
}
