package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unordered-pair expansion of a sorted array column: all (a, b) with
  * a before b in the array — C(n,2) structs, generated scan-side with
  * nested `transform` (codegen'd, no join). The standard companion of a
  * bucketing step: groupBy(bucket) → collect_set → pairs, which scans the
  * corpus once, instead of a bucket self-join that re-computes the
  * upstream pipeline per side.
  */
object ArrayPairs {

  /** @param ids sorted array column; returns array<struct<a,b>>. */
  def of(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)),
        y => struct(x.as("a"), y.as("b")))))
}
