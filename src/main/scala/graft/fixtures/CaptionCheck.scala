package graft.fixtures

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** J7 caption-equality leg: regenerate the ground-truth caption from the
  * image id and compare (test-mode validation; a cluster deployment joins a
  * reference_images table instead). */
object CaptionCheck {
  private val captionUdf = udf((i: Long) => FixtureGen.caption(i))
  def expectedCaption(idNum: Column): Column = captionUdf(idNum)
}
