package graft.ops

import graft.QueryDef

object Cdc {
  val defs: Seq[(String, QueryDef)] = Seq()
}
