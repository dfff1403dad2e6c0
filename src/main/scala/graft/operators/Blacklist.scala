package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Blacklisted-reaction removal: broadcast left_anti ("complement of
  * left_semi") on the normalized reaction term — the reference's
  * `filterBlacklist` (/root/reference .. stage/OpenFdaEtl.scala:57-61).
  * The blacklist is a few hundred terms, so the broadcast hint keeps this
  * a map-side BroadcastHashJoin at any scale.
  */
object Blacklist {

  def filter(events: DataFrame, blacklist: DataFrame): DataFrame =
    events.join(broadcast(blacklist),
      events("reaction_reactionmeddrapt") === blacklist("reactions"), "left_anti")
}
