package graft.lang

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's map-examples/scott fixture — the real-world
  * shipped-item mapping (SURVEY §5). What the reference repo actually
  * contains (data/testing/map-examples/scott/): four variants of the
  * TRANSFORM only — no input payload and no golden data output
  * (`scott-result.edn` is a PARSE TREE, not evaluation output), and
  * no reference test loads any of them. Both program variants carry
  * authoring defects that cannot evaluate:
  *
  *  - transform-to-shipped-item-instance.json:40 — the stray
  *    `$containspayload01.Crop` (an unbound variable where
  *    `$payload01.Crop` was meant);
  *  - shipped-item-modular.json:52-53 — a missing comma between the
  *    `"content"` and `"listAgencyIdentifier"` pairs.
  *
  * So the honest port is three-part: (1) the verbatim raw transform
  * PARSES (the same claim the reference's own parse-tree artifact
  * makes); (2) the modular variant's self-contained
  * `$CropClassTable`/`$CropClassLookup` prelude
  * (shipped-item-modular.json:1-15) evaluates VERBATIM; (3) the full
  * modular transform, with only the missing comma repaired, runs
  * DISTRIBUTED over a payload DataFrame (one shipment document per
  * row — the production shape) and its output is pinned field by
  * field as the golden output the reference never recorded.
  */
class ScottSpec extends SparkSpec {
  import spark.implicits._

  /** shipped-item-modular.json:1-15, verbatim. */
  private val prelude =
    """( $CropClassTable := {'corn'        : 'C',
      |			'soybeans'    : 'S',
      |			'alfalfa'     : 'ALF',
      |			'cotton'      : 'TN',
      |			'wheat'       : 'SW',
      |			'springwheat' : 'SW',
      |			'winterwheat' : 'WW'};
      |
      |    $CropClassLookup := function($key) /* Lookup the crop code. */
      |		   { ( $v := $lookup($CropClassTable, $lowercase($key));
      |		       $v ? $v : '') };
      |
      |    $CropClassLookup('CORN')
      |)""".stripMargin

  test("the crop-class prelude evaluates verbatim") {
    assert(RM.eval(prelude, spark).contains("C"))
  }

  /** shipped-item-modular.json body with ONE repair: the missing
    * comma after `$CropClassLookup($p.Crop)` (fixture line 52). The
    * prelude is bound in the same block instead of the fixture's two
    * disconnected top-level forms.
    */
  private val transform =
    """( $CropClassTable := {'corn'        : 'C',
      |			'soybeans'    : 'S',
      |			'alfalfa'     : 'ALF',
      |			'cotton'      : 'TN',
      |			'wheat'       : 'SW',
      |			'springwheat' : 'SW',
      |			'winterwheat' : 'WW'};
      |  $CropClassLookup := function($key)
      |		   { ( $v := $lookup($CropClassTable, $lowercase($key));
      |		       $v ? $v : '') };
      |{
      |   "shippedItemInstance": [
      |   $map(payload, function($p,$i){
      |       {
      |	   "typeCode": 'seed',
      |	   "identifier": {
      |	       "content": $p.ShipmentNumber & '-' & $p.SeqCode,
      |	       "typeCode": 'shipment_line_identifier'
      |	   },
      |	   "item": {
      |	       "brandName": $p.SeedBrand,
      |	       "manufacturerItemIdentification": {
      |		   "identifier": ($p.Crop = 'TREATMENT') ? ($p.ItemNumber) : '',
      |		   "typeCode": ($p.Crop = 'TREATMENT') ?  ('SKU') : ''
      |	       },
      |	       "description": $p.Description,
      |	       "gtinid": ( $p.Crop != 'TREATMENT' and $length($string($p.Crop)) > 12 ) ? ($p.ItemNumber) : '',
      |	       "varietyName": $p.ShortDescription,
      |	       "productName": $p.ShortDescription
      |	   },
      |	   "quantity": {
      |	       "unitCode": $p.UOM,
      |	       "content": $number($p.Quantity)
      |	   },
      |	   "description": {
      |	       "content": $p.ShortDescription & (($length($string($p.LotId)) > 0) ? ('-' & $p.LotId) : ''),
      |	       "typeCode": "mics_display"
      |	   },
      |	   "classification": {
      |	       "codes": {
      |		   "code": [
      |		       {
      |			   "content": $CropClassLookup($p.Crop),
      |			   "listAgencyIdentifier": 'AGIIS',
      |			   "typeCode": $p.Crop
      |		       },
      |		       {
      |			   "content": $p.SeedTrait,
      |			   "typeCode": "Trait"
      |		       }
      |		   ]
      |	       },
      |	       "typeCode": 'Crop'
      |	   },
      |	   "lot": {
      |	       "identifier": {
      |		   "content": $string($p.LotId),
      |		   "typeCode": 'Lot'
      |	       }
      |	   },
      |	   "documentReference": {
      |	       "identifier": {
      |		   "content": $string($p.ShipmentNumber)
      |	       },
      |	       "typeCode": 'shipment_identifier',
      |	       "documentDateTime": ($contains($string($p.OrderDate), '-' )) ? ($string($p.OrderDate) & 'T00:00:00.000-05:00') : ''
      |	   },
      |	   "manufacturingParty": {
      |	       "name": $p.ManufacturerName
      |	   },
      |	   "party": [
      |	       {
      |		   "identifier": [
      |		       {
      |			   "content": $string($p.CustomerNumber),
      |			   "typeCode": 'retailer_grower_identifier'
      |		       }
      |		   ],
      |		   "name": $p.CustomerLookupName,
      |		   "location": {
      |		       "glnid": $string($p.CustomerGLN)
      |		   },
      |		   "typeCode": 'Grower'
      |	       },
      |	       {
      |		   "name": $p.Retailer,
      |		   "location": {
      |		       "glnid": $string($p.RetailerGLN)
      |		   },
      |		   "typeCode": 'Retailer'
      |	       }
      |	   ],
      |	   "itemIdentifierSet": [
      |	       {
      |		   "identifier": [
      |		       {
      |			   "content": $p.SeedTreatments,
      |			   "typeCode": 'product'
      |		       }
      |		   ],
      |		   "schemeAgencyIdentifier": 'manufacturer_seed_treatment_identifier',
      |		   "schemeIdentifier": $p.SeedTreatments,
      |		   "typeCode": 'seed_treatment'
      |	       }
      |	   ]
      |       }})
      |   ]
      |} )""".stripMargin

  private def item(shipment: String, seq: String, crop: String,
      itemNo: String, lot: String, orderDate: String,
      qty: String): String =
    s"""{"ShipmentNumber": "$shipment", "SeqCode": "$seq",
       |"SeedBrand": "BrandA", "Crop": "$crop",
       |"ItemNumber": "$itemNo", "Description": "Seed product",
       |"ShortDescription": "SD-$seq", "UOM": "BAG",
       |"Quantity": "$qty", "LotId": "$lot",
       |"OrderDate": "$orderDate", "SeedTrait": "TraitX",
       |"SeedTreatments": "TRT1", "ManufacturerName": "AcmeSeeds",
       |"CustomerNumber": "CU7", "CustomerLookupName": "Farmer Joe",
       |"CustomerGLN": "123", "Retailer": "RetailCo",
       |"RetailerGLN": "456"}""".stripMargin.replace("\n", " ")

  test("the shipped-item mapping runs distributed over a payload frame") {
    // one shipment document per row, items covering the branch
    // matrix: crop-table hit (CORN), the TREATMENT special case
    // (SKU identifier, no gtinid, table miss), and a >12-char
    // unknown crop (gtinid = ItemNumber); LotId present vs empty;
    // OrderDate dashed vs empty
    val doc = s"""{"payload": [
      ${item("SH100", "01", "CORN", "IT1", "LOT9", "2023-05-04", "240")},
      ${item("SH200", "02", "TREATMENT", "IT2", "", "", "3")},
      ${item("SH300", "03", "WinterWheatPlus", "IT3", "L2", "", "12.5")}
    ]}"""
    val df = spark.read.json(Seq(doc).toDS)
    val out = RM.evalCol(transform, df)
      .select(to_json(col("value")).as("j")).head.getString(0)
    // evalCol returns the raw COLUMN shape (pre-jflatten): the
    // fixture's `[ $map(...) ]` array literal still wraps the map
    // result in its container level — RM.eval's driver finalization
    // splices it (CoreSpec pins those rules); unwrap here
    val items: Seq[Map[String, Any]] = (ujsonLite(out) match {
      case Seq(inner: Seq[_]) => inner
      case flat => flat
    }).asInstanceOf[Seq[Map[String, Any]]]
    assert(items.size == 3)

    val i1 = items(0)
    assert(i1("typeCode") == "seed")
    assert(i1("identifier") == Map(
      "content" -> "SH100-01", "typeCode" -> "shipment_line_identifier"))
    assert(i1("item") == Map(
      "brandName" -> "BrandA",
      "manufacturerItemIdentification" -> Map(
        "identifier" -> "", "typeCode" -> ""),
      "description" -> "Seed product",
      "gtinid" -> "", // CORN is 4 chars
      "varietyName" -> "SD-01", "productName" -> "SD-01"))
    assert(i1("quantity") == Map("unitCode" -> "BAG",
      "content" -> 240.0))
    assert(i1("description") == Map(
      "content" -> "SD-01-LOT9", "typeCode" -> "mics_display"))
    assert(i1("classification") == Map(
      "codes" -> Map("code" -> Seq(
        Map("content" -> "C", "listAgencyIdentifier" -> "AGIIS",
          "typeCode" -> "CORN"),
        Map("content" -> "TraitX", "typeCode" -> "Trait"))),
      "typeCode" -> "Crop"))
    assert(i1("lot") == Map("identifier" -> Map(
      "content" -> "LOT9", "typeCode" -> "Lot")))
    assert(i1("documentReference") == Map(
      "identifier" -> Map("content" -> "SH100"),
      "typeCode" -> "shipment_identifier",
      "documentDateTime" -> "2023-05-04T00:00:00.000-05:00"))
    assert(i1("manufacturingParty") == Map("name" -> "AcmeSeeds"))
    assert(i1("party") == Seq(
      Map("identifier" -> Seq(Map("content" -> "CU7",
          "typeCode" -> "retailer_grower_identifier")),
        "name" -> "Farmer Joe",
        "location" -> Map("glnid" -> "123"), "typeCode" -> "Grower"),
      Map("name" -> "RetailCo", "location" -> Map("glnid" -> "456"),
        "typeCode" -> "Retailer")))
    assert(i1("itemIdentifierSet") == Seq(Map(
      "identifier" -> Seq(Map("content" -> "TRT1",
        "typeCode" -> "product")),
      "schemeAgencyIdentifier" ->
        "manufacturer_seed_treatment_identifier",
      "schemeIdentifier" -> "TRT1", "typeCode" -> "seed_treatment")))

    val i2 = items(1)
    assert(i2("item").asInstanceOf[Map[String, Any]](
      "manufacturerItemIdentification") == Map(
      "identifier" -> "IT2", "typeCode" -> "SKU"),
      "TREATMENT routes the item number to the SKU identifier")
    assert(i2("item").asInstanceOf[Map[String, Any]]("gtinid") == "")
    assert(i2("description").asInstanceOf[Map[String, Any]](
      "content") == "SD-02", "empty LotId appends no suffix")
    assert(i2("classification").asInstanceOf[Map[String, Any]](
      "codes").asInstanceOf[Map[String, Any]]("code")
      .asInstanceOf[Seq[Map[String, Any]]].head("content") == "",
      "TREATMENT misses the crop table -> ''")
    assert(i2("documentReference").asInstanceOf[Map[String, Any]](
      "documentDateTime") == "", "dash-less OrderDate -> ''")

    val i3 = items(2)
    assert(i3("item").asInstanceOf[Map[String, Any]](
      "gtinid") == "IT3", ">12-char non-TREATMENT crop ships gtinid")
    assert(i3("quantity").asInstanceOf[Map[String, Any]](
      "content") == 12.5)
  }

  test("the raw transform fixture parses verbatim") {
    // transform-to-shipped-item-instance.json, embedded verbatim —
    // including its authoring defects ($containspayload01 at :40,
    // the toy /(\d4)-(\d2)-(\d2)/ regex at :66), which parse fine
    // (an unbound variable is an EVAL error); this is exactly the
    // claim the reference's own scott-result.edn parse tree makes
    val raw = rawFixture
    val ast = Parser.parse(raw)
    assert(ast != null)
  }

  /** transform-to-shipped-item-instance.json:3-109 verbatim. */
  private def rawFixture: String =
    """{
      |   "shippedItemInstance": [
      |   $map(payload, function($payload01,$i){
      |       {
      |           "typeCode": 'seed',
      |           "identifier": {
      |               "content": $payload01.ShipmentNumber & '-' & $payload01.SeqCode,
      |               "typeCode": 'shipment_line_identifier'
      |        },
      |           "item": {
      |               "brandName": $payload01.SeedBrand,
      |               "manufacturerItemIdentification": {
      |                   "identifier": ($payload01.Crop = 'TREATMENT') ? ($payload01.ItemNumber) : '',
      |                   "typeCode": ($payload01.Crop = 'TREATMENT') ?  ('SKU') : ''
      |                },
      |               "description": $payload01.Description,
      |               "gtinid": ( $payload01.Crop != 'TREATMENT' and $length($string($payload01.Crop)) > 12 ) ? ($payload01.ItemNumber) : '',
      |               "varietyName": $payload01.ShortDescription,
      |               "productName": $payload01.ShortDescription
      |        },
      |           "quantity": {
      |               "unitCode": $payload01.UOM,
      |               "content": $number($payload01.Quantity)
      |        },
      |           "description": {
      |               "content": $payload01.ShortDescription & (($length($string($payload01.LotId)) > 0) ? ('-' & $payload01.LotId) : ''),
      |               "typeCode": "mics_display"
      |        },
      |           "classification": {
      |               "codes": {
      |                   "code": [
      |                       {
      |                           "content": ( $payload01.Crop = 'Corn' or $payload01.Crop = 'CORN' ) ? ('C') :
      |                                    ( $payload01.Crop = 'Soybeans' or $payload01.Crop = 'SOYBEANS' ) ? ('S') :
      |                                    ( $payload01.Crop = 'Alfalfa' or $payload01.Crop = 'ALFALFA' ) ? ('ALF') :
      |                                    ( $payload01.Crop = 'Cotton' or $payload01.Crop = 'COTTON' ) ? ('TN') :
      |                                    ( $payload01.Crop = 'Wheat' or $payload01.Crop = 'WHEAT' ) ? ('SW') :
      |                                    ( $containspayload01.Crop = 'SpringWheat' or $payload01.Crop = 'SPRINGWHEAT' ) ? ('SW') :
      |                                    ( $payload01.Crop = 'WinterWheat' or $payload01.Crop = 'WINTERWHEAT' ) ? ('WW') : '',
      |                           "listAgencyIdentifier": 'AGIIS',
      |                           "typeCode": $payload01.Crop
      |                    },
      |                       {
      |                           "content": $payload01.SeedTrait,
      |                           "typeCode": "Trait"
      |                    }
      |                ]
      |            },
      |               "typeCode": 'Crop'
      |        },
      |           "lot": {
      |               "identifier": {
      |                   "content": $string($payload01.LotId),
      |                   "typeCode": 'Lot'
      |            }
      |        },
      |           "documentReference": {
      |               "identifier": {
      |                   "content": $string($payload01.ShipmentNumber)
      |            },
      |               "typeCode": 'shipment_identifier',
      |               "documentDateTime": ($contains($string($payload01.OrderDate), '-' )) ? ($string($payload01.OrderDate) & 'T00:00:00.000-05:00') :
      |                        ($length($string($payload01.OrderDate)) = 8 ) ?
      |                        (($string($payload01.OrderDate) ~> /(\d4)-(\d2)-(\d2)/) & 'T00:00:00.000-05:00') : ''
      |        },
      |           "manufacturingParty": {
      |            "name": $payload01.ManufacturerName
      |        },
      |           "party": [
      |               {
      |                   "identifier": [
      |                       {
      |                           "content": $string($payload01.CustomerNumber),
      |                           "typeCode": 'retailer_grower_identifier'
      |                    }
      |                ],
      |                   "name": $payload01.CustomerLookupName,
      |                   "location": {
      |                       "glnid": $string($payload01.CustomerGLN)
      |                },
      |                   "typeCode": 'Grower'
      |            },
      |               {
      |                   "name": $payload01.Retailer,
      |                   "location": {
      |                       "glnid": $string($payload01.RetailerGLN)
      |                },
      |                   "typeCode": 'Retailer'
      |            }
      |        ],
      |           "itemIdentifierSet": [
      |               {
      |                   "identifier": [
      |                       {
      |                           "content": $payload01.SeedTreatments,
      |                           "typeCode": 'product'
      |                    }
      |                ],
      |                   "schemeAgencyIdentifier": 'manufacturer_seed_treatment_identifier',
      |                   "schemeIdentifier": $payload01.SeedTreatments,
      |                   "typeCode": 'seed_treatment'
      |            }
      |        ]
      |    }})
      |    /*  end map */
      |    ]
      |}""".stripMargin

  /** Minimal JSON reader for the golden compare: the output's
    * shippedItemInstance array as Scala maps/seqs (strings, doubles,
    * nested maps/lists) via the Spark-internal Jackson the repo
    * already ships.
    */
  private def ujsonLite(json: String): Seq[Any] = {
    def conv(n: com.fasterxml.jackson.databind.JsonNode): Any =
      if (n.isTextual) n.asText
      else if (n.isNumber) n.asDouble
      else if (n.isBoolean) n.asBoolean
      else if (n.isArray)
        (0 until n.size).map(i => conv(n.get(i)))
      else if (n.isObject) {
        import scala.jdk.CollectionConverters._
        n.properties().asScala.map(e =>
          e.getKey -> conv(e.getValue)).toMap
      } else null
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    conv(root.get("shippedItemInstance")).asInstanceOf[Seq[Any]]
  }
}
