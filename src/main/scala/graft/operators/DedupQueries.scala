package graft.operators

import graft.QueryDef

object DedupQueries {
  def defs: Map[String, QueryDef] = Map()
}
