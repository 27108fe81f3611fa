package graft.operators

import graft.QueryDef

object CalendarQueries {
  def defs: Map[String, QueryDef] = Map()
}
