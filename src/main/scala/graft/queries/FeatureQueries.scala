package graft.queries

object FeatureQueries {
  def all: Seq[HarnessQuery] = Seq.empty
}
