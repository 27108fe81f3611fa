package graft.operators

import graft.QueryDef

object MultimodalQueries {
  def defs: Map[String, QueryDef] = Map()
}
