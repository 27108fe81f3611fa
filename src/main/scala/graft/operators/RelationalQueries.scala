package graft.operators

import graft.QueryDef

object RelationalQueries {
  def defs: Map[String, QueryDef] = Map()
}
