package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources.Filter

/** Access bridge for `PredicateUtils.toV1` (private[sql]): converts DSv2
  * `Predicate`s to the V1 `Filter` algebra the rest of the source layer
  * already speaks. Lives under the spark namespace solely for package
  * access — the same placement rule as [[GraftMergeCommand]]. */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}
