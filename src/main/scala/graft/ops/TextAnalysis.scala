package graft.ops

import graft.QueryDef

object TextAnalysis {
  val defs: Seq[(String, QueryDef)] = Seq()
}
