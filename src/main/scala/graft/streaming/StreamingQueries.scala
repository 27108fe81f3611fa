package graft.streaming

import graft.QueryDef

object StreamingQueries {
  def defs: Map[String, QueryDef] = Map()
}
