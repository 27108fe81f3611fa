package graft.operators

import graft.QueryDef

object TextQueries {
  def defs: Map[String, QueryDef] = Map()
}
