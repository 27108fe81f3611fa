package graft.operators

import graft.QueryDef

object EventQueries {
  def defs: Map[String, QueryDef] = Map()
}
