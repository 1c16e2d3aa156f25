package graft.config

/** Config hot-reload deep-diff (reference `task/sinker.go:340-519`):
  * decide the MINIMAL restart set for a new config instead of bouncing
  * everything.
  *
  *   - a changed Kafka or ClickHouse section restarts all consumers
  *     (applyAnotherConfig branch 1, sinker.go:406-443)
  *   - otherwise consumers (consumer groups) whose topic set changed are
  *     stopped and re-created; removed groups stop; new groups start
  *     (sinker.go:444-462, 478-517)
  *   - inside an unchanged group, only tasks whose TaskConfig actually
  *     differs are re-initialized (sinker.go:463-476)
  */
object ConfigReload {

  /** The restart plan; task names throughout. */
  final case class Plan(
      restartAll: Boolean,
      stopTasks: Seq[String],
      startTasks: Seq[String],
      restartTasks: Seq[String]) {
    def isNoop: Boolean =
      !restartAll && stopTasks.isEmpty && startTasks.isEmpty && restartTasks.isEmpty
  }

  val Noop: Plan = Plan(restartAll = false, Nil, Nil, Nil)

  def plan(oldTasks: Seq[TaskConfig], newTasks: Seq[TaskConfig],
      globalSectionChanged: Boolean = false): Plan = {
    if (globalSectionChanged)
      return Plan(restartAll = true, oldTasks.map(_.name),
        newTasks.map(_.name), Nil)
    if (oldTasks == newTasks) return Noop

    val oldByGroup = oldTasks.groupBy(_.consumerGroup)
    val newByGroup = newTasks.groupBy(_.consumerGroup)
    val stop = Seq.newBuilder[String]
    val start = Seq.newBuilder[String]
    val restart = Seq.newBuilder[String]

    oldByGroup.toSeq.sortBy(_._1).foreach { case (group, oldMembers) =>
      newByGroup.get(group) match {
        case None =>
          // group gone -> stop its tasks (sinker.go:448-451)
          stop ++= oldMembers.map(_.name)
        case Some(newMembers)
            if oldMembers.map(_.topic).sorted != newMembers.map(_.topic).sorted =>
          // subscription changed -> bounce the whole consumer
          stop ++= oldMembers.map(_.name)
          start ++= newMembers.map(_.name)
        case Some(newMembers) =>
          val oldByName = oldMembers.map(t => t.name -> t).toMap
          val newByName = newMembers.map(t => t.name -> t).toMap
          stop ++= oldMembers.collect {
            case t if !newByName.contains(t.name) => t.name }
          start ++= newMembers.collect {
            case t if !oldByName.contains(t.name) => t.name }
          // changed task configs re-init in place (sinker.go:463-472)
          restart ++= newMembers.collect {
            case t if oldByName.get(t.name).exists(_ != t) => t.name }
      }
    }
    // brand-new groups (sinker.go:495-508)
    newByGroup.toSeq.sortBy(_._1).foreach { case (group, members) =>
      if (!oldByGroup.contains(group)) start ++= members.map(_.name)
    }
    Plan(restartAll = false, stop.result(), start.result(), restart.result())
  }
}
