package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key salting for skewed equi-joins — the manual tool for the case
  * AQE's runtime skew-split cannot reach: a hot join key whose dim
  * side is too large to broadcast and whose pipeline (stateful
  * streaming, multi-stage reuse of the same partitioning) pins the
  * join shape at plan time. The fact side appends a deterministic
  * salt in [0, r) (a hash of a HIGH-cardinality fact column, so one
  * hot key's rows spread over r shuffle partitions); the dim side
  * replicates each row r times, once per salt value; the equi-join on
  * (key, salt) is RESULT-IDENTICAL to the plain key join — salting
  * redistributes rows, it never changes which pairs match.
  *
  * Cost model: dim side ×r rows shuffled (cheap when dim ≪ fact — the
  * regime where salting applies), fact side unchanged; the hot key's
  * partition shrinks ~r-fold. SaltingSpec measures exactly that on a
  * forced shuffle join, and q208's oracle pins result identity.
  */
object Salting {

  /** Deterministic fact-side salt: `xxhash64(saltBy) mod r`. */
  def salt(saltBy: Column, r: Int): Column =
    pmod(xxhash64(saltBy), lit(r.toLong)).cast("int")

  /** Salted equi-join of `fact` and `dim` on `key` — provably equal to
    * `fact.join(dim, key)` for a dim that is UNIQUE per key (the dim
    * contract of a skewed-join fix; replication would duplicate
    * matches otherwise). `saltBy` must be a high-cardinality fact
    * column (e.g. the fact's own primary key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBy: Column, r: Int): DataFrame = {
    val f = fact.withColumn("__salt", salt(saltBy, r))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(r - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
