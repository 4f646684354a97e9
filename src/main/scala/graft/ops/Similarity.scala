package graft.ops

import graft.QueryDef

object Similarity {
  val defs: Seq[(String, QueryDef)] = Seq()
}
