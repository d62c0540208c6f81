package graft

import org.apache.spark.sql.DataFrame

/** Non-truncating digest of a DataFrame's analyzed plan — the cache key for
  * fit-once/score-many model caches and count caches. The default plan
  * `toString` clips wide plans at spark.sql.debug.maxToStringFields
  * ("... N more fields"), so two different wide projections could collide
  * on the clipped string; semanticHash plus the full-width treeString
  * cannot clip. Known limitation (documented cache contract): data
  * rewritten IN PLACE under the same path still aliases — callers that
  * rewrite inputs mid-session must bypass the cache. */
object PlanKey {
  def digest(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed.canonicalized
    plan.semanticHash().toString + ":" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(plan.treeString(verbose = true, addSuffix = false,
          maxFields = Int.MaxValue).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
  }
}
