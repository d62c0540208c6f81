package graft.tools

import org.apache.spark.sql.types._

/** Schema evolution management (reference:
  * src/streaming/schema_evolution_manager.py — `SchemaCompatibilityChecker`
  * :123-221 and `SchemaEvolutionEngine._analyze_schema_differences`:273-397).
  *
  * Pure metadata: operates on StructType, so it costs nothing at any data
  * scale — the point is to gate a 100 TB backfill BEFORE it runs. Backward =
  * the new schema can read old data (no removed fields, no incompatible type
  * changes, no nullable→required). Forward = old readers survive new data
  * (no added required fields). The widening lattice mirrors the reference:
  * int→{long,double,float}, long→{double,float}, float→double,
  * boolean→string.
  */
object SchemaEvolution {

  sealed trait Compatibility
  case object Backward extends Compatibility
  case object Forward extends Compatibility
  case object Full extends Compatibility

  final case class SchemaChange(
      field: String, changeType: String,
      oldType: Option[String], newType: Option[String], impact: String)

  final case class EvolutionPlan(
      changes: Seq[SchemaChange], migrationSteps: Seq[String],
      rollbackSteps: Seq[String], compatible: Boolean, issues: Seq[String])

  /** reference `_are_types_compatible`:201-221 — the widening lattice. */
  def typesCompatible(oldT: DataType, newT: DataType): Boolean =
    (oldT, newT) match {
      case (a, b) if a == b => true
      case (_: IntegerType, _: LongType | _: DoubleType | _: FloatType) => true
      case (_: LongType, _: DoubleType | _: FloatType) => true
      case (_: FloatType, _: DoubleType) => true
      case (_: BooleanType, _: StringType) => true
      case _ => false
    }

  def checkCompatibility(oldS: StructType, newS: StructType,
                         mode: Compatibility): (Boolean, Seq[String]) = {
    val issues = mode match {
      case Backward => backwardIssues(oldS, newS)
      case Forward  => forwardIssues(oldS, newS)
      case Full     => backwardIssues(oldS, newS) ++ forwardIssues(oldS, newS)
    }
    (issues.isEmpty, issues)
  }

  private def backwardIssues(oldS: StructType, newS: StructType): Seq[String] = {
    val newF = newS.fields.map(f => f.name -> f).toMap
    val oldNames = oldS.fieldNames.toSet
    val existing = oldS.fields.toSeq.flatMap { of =>
      newF.get(of.name) match {
        case None =>
          Seq(s"Field '${of.name}' was removed (breaks backward compatibility)")
        case Some(nf) =>
          val typeIssue =
            if (!typesCompatible(of.dataType, nf.dataType))
              Seq(s"Field '${of.name}' type changed from ${of.dataType.simpleString} to ${nf.dataType.simpleString}")
            else Nil
          val nullIssue =
            if (of.nullable && !nf.nullable)
              Seq(s"Field '${of.name}' changed from nullable to non-nullable")
            else Nil
          typeIssue ++ nullIssue
      }
    }
    // an added REQUIRED field also breaks backward reads (old data has no
    // value for it); the reference files this only under forward
    // (schema_evolution_manager.py:185) — by its own backward definition
    // ("new schema can read old data") it belongs here too
    val addedRequired = newS.fields.toSeq.collect {
      case nf if !oldNames.contains(nf.name) && !nf.nullable =>
        s"Added non-nullable field '${nf.name}' (old data has no value for it)"
    }
    existing ++ addedRequired
  }

  private def forwardIssues(oldS: StructType, newS: StructType): Seq[String] = {
    val oldNames = oldS.fieldNames.toSet
    newS.fields.toSeq.collect {
      case nf if !oldNames.contains(nf.name) && !nf.nullable =>
        s"Added non-nullable field '${nf.name}' (breaks forward compatibility)"
    }
  }

  /** reference `_analyze_schema_differences` + `_generate_migration_steps` /
    * `_generate_rollback_plan`. */
  def evolutionPlan(oldS: StructType, newS: StructType): EvolutionPlan = {
    val oldF = oldS.fields.map(f => f.name -> f).toMap
    val newF = newS.fields.map(f => f.name -> f).toMap
    val added = newS.fields.toSeq.filterNot(f => oldF.contains(f.name)).map { f =>
      SchemaChange(f.name, "add_column", None, Some(f.dataType.simpleString),
        if (f.nullable) "low" else "high")
    }
    val removed = oldS.fields.toSeq.filterNot(f => newF.contains(f.name)).map { f =>
      SchemaChange(f.name, "drop_column", Some(f.dataType.simpleString), None, "high")
    }
    val retyped = oldS.fields.toSeq.flatMap { of =>
      newF.get(of.name).filter(_.dataType != of.dataType).map { nf =>
        SchemaChange(of.name, "change_type",
          Some(of.dataType.simpleString), Some(nf.dataType.simpleString),
          if (typesCompatible(of.dataType, nf.dataType)) "medium" else "high")
      }
    }
    val changes = added ++ removed ++ retyped
    val steps = changes.map {
      case SchemaChange(f, "add_column", _, Some(t), _)    => s"ALTER TABLE ADD COLUMN $f $t"
      case SchemaChange(f, "drop_column", _, _, _)         => s"ALTER TABLE DROP COLUMN $f"
      case SchemaChange(f, "change_type", _, Some(t), _)   => s"ALTER TABLE ALTER COLUMN $f TYPE $t"
      case c                                               => s"-- manual step for ${c.field}"
    }
    val rollback = changes.reverse.map {
      case SchemaChange(f, "add_column", _, _, _)          => s"ALTER TABLE DROP COLUMN $f"
      case SchemaChange(f, "drop_column", Some(t), _, _)   => s"ALTER TABLE ADD COLUMN $f $t"
      case SchemaChange(f, "change_type", Some(t), _, _)   => s"ALTER TABLE ALTER COLUMN $f TYPE $t"
      case c                                               => s"-- manual rollback for ${c.field}"
    }
    val (ok, issues) = checkCompatibility(oldS, newS, Full)
    EvolutionPlan(changes, steps, rollback, ok, issues)
  }
}
