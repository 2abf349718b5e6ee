package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension installer — the standard way a Spark library
  * ships SQL surface: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes every session of the application see the graft function
  * library (vec_dot, vec_cosine, shingle_hashes, minhash_from_hashes,
  * simhash_sig) in `spark.sql` strings. For an already-running session
  * use [[graft.functions.GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
