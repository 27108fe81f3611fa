package graft.operators

import graft.QueryDef

object SimilarityQueries {
  def defs: Map[String, QueryDef] = Map()
}
