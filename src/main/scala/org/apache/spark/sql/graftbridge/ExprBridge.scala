package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, ImplicitCastInputTypes}
import org.apache.spark.sql.types.AbstractDataType

/** Lets an expression outside the sql package inherit another
  * expression's implicit-cast contract: `AbstractDataType` is
  * `private[sql]`, so the `inputTypes` override must live here (the
  * same access-modifier dance as [[ColumnBridge]]).
  */
trait DelegatesInputTypes extends ImplicitCastInputTypes {
  protected def inputTypesDelegate: ExpectsInputTypes
  override def inputTypes: Seq[AbstractDataType] = inputTypesDelegate.inputTypes
}
