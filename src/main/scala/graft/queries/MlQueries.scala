package graft.queries

object MlQueries {
  def all: Seq[HarnessQuery] = Seq.empty
}
