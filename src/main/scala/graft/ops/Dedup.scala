package graft.ops

import graft.QueryDef

object Dedup {
  val defs: Seq[(String, QueryDef)] = Seq()
}
