"""RML/R2RML/FnO vocabulary constants.

Mirrors the term inventory the reference understands
(``/root/reference/src/voc.ts``) — the complete set of IRIs the mapping
parser, IncRML rewriter, and FnO registry need.
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RR = "http://www.w3.org/ns/r2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"
QL = "http://semweb.mmlab.be/ns/ql#"
# new-generation RML core (RML-IO spec, kg-construct W3C CG): structured
# reference formulations with XPath namespace declarations
RMLCORE = "http://w3id.org/rml/"
RMLCORE_XPATH_REF_FORM = RMLCORE + "XPathReferenceFormulation"
RMLCORE_NAMESPACE = RMLCORE + "namespace"
RMLCORE_NAMESPACE_PREFIX = RMLCORE + "namespacePrefix"
RMLCORE_NAMESPACE_URL = RMLCORE + "namespaceURL"
FNML = "http://semweb.mmlab.be/ns/fnml#"
FNO = "https://w3id.org/function/ontology#"
IDLAB_FN = "http://example.com/idlab/function/"
# the IDLab function namespace has TWO historical spellings: the
# reference's voc.ts + test fixtures use the w3id form
# (/root/reference/src/voc.ts:103, test/rml.test.ts:18) while its README
# example uses the example.com form (README.md:50). Parsed IRIs are
# canonicalized to IDLAB_FN so both work in mapping documents.
IDLAB_FN_W3ID = "https://w3id.org/imec/idlab/function#"


def canonical_function_iri(iri: str) -> str:
    """Normalize alternate function-namespace spellings to the canonical
    constants the registry/CDC detection compare against."""
    if iri.startswith(IDLAB_FN_W3ID):
        return IDLAB_FN + iri[len(IDLAB_FN_W3ID):]
    return iri
GREL = "http://users.ugent.be/~bjdmeest/function/grel.ttl#"
RMLT = "http://semweb.mmlab.be/ns/rml-target#"
LDES = "https://w3id.org/ldes#"
TREE = "https://w3id.org/tree#"
VOID = "http://rdfs.org/ns/void#"
DCT = "http://purl.org/dc/terms/"
AS = "https://www.w3.org/ns/activitystreams#"
FORMATS = "http://www.w3.org/ns/formats/"
CSVW = "http://www.w3.org/ns/csvw#"
# csvw terms (src/voc.ts:86-93) — use sites may join CSVW + name; the
# constants keep the inventory auditable
CSVW_URL = CSVW + "url"
CSVW_DIALECT = CSVW + "dialect"
CSVW_DIALECT_CLASS = CSVW + "Dialect"
CSVW_DELIMITER = CSVW + "delimiter"
CSVW_TABLE = CSVW + "Table"
RMLS = "http://semweb.mmlab.be/ns/rmls#"
TD = "https://www.w3.org/2019/wot/td#"
HCTL = "https://www.w3.org/2019/wot/hypermedia#"

RDF_TYPE = RDF + "type"

# r2rml (src/voc.ts:46-66)
RR_TRIPLES_MAP = RR + "TriplesMap"
RR_SUBJECT_MAP = RR + "subjectMap"
RR_PREDICATE_OBJECT_MAP = RR + "predicateObjectMap"
RR_PREDICATE_MAP = RR + "predicateMap"
RR_PREDICATE = RR + "predicate"
RR_OBJECT = RR + "object"  # constant shortcut, R2RML §6.3
RR_SUBJECT = RR + "subject"  # constant shortcut
RR_GRAPH = RR + "graph"  # constant shortcut
RR_DEFAULT_GRAPH = RR + "defaultGraph"
RR_OBJECT_MAP = RR + "objectMap"
RR_CONSTANT = RR + "constant"
RR_INVERSE_EXPRESSION = RR + "inverseExpression"
RR_TEMPLATE = RR + "template"
RR_TERM_TYPE = RR + "termType"
RR_DATATYPE = RR + "datatype"
RR_DATATYPE_CAMEL = RR + "dataType"  # reference fixtures use both spellings
RR_LANGUAGE = RR + "language"
RR_CLASS = RR + "class"
RR_GRAPH_MAP = RR + "graphMap"
RR_PARENT_TRIPLES_MAP = RR + "parentTriplesMap"
RR_PARENT_TERM_MAP = RR + "parentTermMap"
# plain R2RML §11 join-condition form (official kg-construct suite);
# the FNML idlab-fn:equal form the reference fixtures use is parsed too
RR_JOIN_CONDITION = RR + "joinCondition"
RR_CHILD = RR + "child"
RR_PARENT = RR + "parent"
RR_IRI = RR + "IRI"
RR_LITERAL = RR + "Literal"
RR_BLANK_NODE = RR + "BlankNode"
# class markers the reference declares (type annotations on term-map
# bnodes; parsing keys off predicates, but the inventory is complete)
RR_SUBJECT_MAP_CLASS = RR + "SubjectMap"
RR_POM_CLASS = RR + "PredicateObjectMap"
RR_GRAPH_MAP_CLASS = RR + "GraphMap"
RR_FUNCTION_TERM_MAP = RR + "FunctionTermMap"

# rml (src/voc.ts:15-24)
RML_LOGICAL_SOURCE = RML + "logicalSource"
RML_LOGICAL_SOURCE_CLASS = RML + "LogicalSource"
RML_SOURCE = RML + "source"
RML_ITERATOR = RML + "iterator"
RML_REFERENCE_FORMULATION = RML + "referenceFormulation"
# relational logical sources: RML's rml:query plus R2RML's
# rr:sqlQuery/rr:tableName (the reference hands these to the Java jar,
# /root/reference/src/rml/rml.ts:136-147; we run them with spark.sql)
RML_QUERY = RML + "query"
RR_SQL_QUERY = RR + "sqlQuery"
RR_TABLE_NAME = RR + "tableName"
RML_REFERENCE = RML + "reference"
RML_LANGUAGE_MAP = RML + "languageMap"
RML_DATATYPE_MAP = RML + "datatypeMap"
RML_LOGICAL_TARGET = RML + "logicalTarget"
RML_JOIN_CONDITION = RML + "joinCondition"

# ql (src/voc.ts:79-84)
QL_JSONPATH = QL + "JSONPath"
QL_CSV = QL + "CSV"
QL_XPATH = QL + "XPath"
# our engine's extensions (not in reference): relational tables & page tables
QL_TABLE = "urn:rml-spark:ql/Table"
QL_PAGES = "urn:rml-spark:ql/Pages"

# fnml / fno (src/voc.ts:68-77)
FNML_FUNCTION_VALUE = FNML + "functionValue"
FNML_FUNCTION_TERM_MAP = FNML + "FunctionTermMap"
FNO_EXECUTES = FNO + "executes"

# idlab-fn (src/voc.ts:104-115)
IDLAB_EXPLICIT_CREATE = IDLAB_FN + "explicitCreate"
IDLAB_IMPLICIT_UPDATE = IDLAB_FN + "implicitUpdate"
IDLAB_IMPLICIT_DELETE = IDLAB_FN + "implicitDelete"
IDLAB_IRI = IDLAB_FN + "iri"
IDLAB_STATE = IDLAB_FN + "state"
IDLAB_WATCHED_PROPERTY = IDLAB_FN + "watchedProperty"
IDLAB_UNIQUE_IRI = IDLAB_FN + "generateUniqueIRI"
IDLAB_TRUE_CONDITION = IDLAB_FN + "trueCondition"
IDLAB_STR_BOOLEAN = IDLAB_FN + "strBoolean"
IDLAB_NOT_EQUAL = IDLAB_FN + "notEqual"
IDLAB_EQUAL = IDLAB_FN + "equal"
IDLAB_STR = IDLAB_FN + "str"

# grel (src/voc.ts:95-102)
GREL_VALUE_PARAMETER = GREL + "valueParameter"
GREL_VALUE_PARAMETER2 = GREL + "valueParameter2"
GREL_ARRAY_JOIN = GREL + "array_join"
GREL_PARAM_A = GREL + "p_array_a"
# the reference's IncRML rewriter emits the SHORT param name
# (/root/reference/src/voc.ts:97 "param_a", used at incrml.ts:503) —
# array_join accepts both spellings
GREL_PARAM_A_ALT = GREL + "param_a"
GREL_PARAM_STRING_SEP = GREL + "param_string_sep"
GREL_BOOL_B = GREL + "bool_b"

# rmls kafka streams (src/voc.ts:26-34)
RMLS_KAFKA_STREAM = RMLS + "KafkaStream"
RMLS_BROKER = RMLS + "broker"
RMLS_TOPIC = RMLS + "topic"
RMLS_GROUP_ID = RMLS + "groupId"
RMLS_HOST_NAME = RMLS + "hostName"
RMLS_PORT = RMLS + "port"

# d2rq remote relational databases (the RML-Mapper vocabulary for the
# RDB sources the reference leaves undeclared and delegates wholesale
# to its Java jar, /root/reference/src/rml/rml.ts:136-147)
D2RQ = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"
D2RQ_DATABASE = D2RQ + "Database"
D2RQ_JDBC_DSN = D2RQ + "jdbcDSN"
D2RQ_JDBC_DRIVER = D2RQ + "jdbcDriver"
D2RQ_USERNAME = D2RQ + "username"
D2RQ_PASSWORD = D2RQ + "password"
RR_SQL2008 = RR + "SQL2008"

# WoT HTTP source descriptions (test/rml.test.ts:299-320)
TD_PROPERTY_AFFORDANCE = TD + "PropertyAffordance"
TD_HAS_FORM = TD + "hasForm"
TD_FORM = TD + "Form"
HCTL_HAS_TARGET = HCTL + "hasTarget"
HCTL_FOR_CONTENT_TYPE = HCTL + "forContentType"

# rml-target / ldes (src/voc.ts:36-45)
RMLT_LOGICAL_TARGET = RMLT + "LogicalTarget"
RMLT_EVENT_STREAM_TARGET = RMLT + "EventStreamTarget"
RMLT_TARGET = RMLT + "target"
RMLT_SERIALIZATION = RMLT + "serialization"
RMLT_LDES = RMLT + "ldes"
RMLT_LDES_BASE_IRI = RMLT + "ldesBaseIRI"
RMLT_LDES_GENERATE_IMMUTABLE_IRI = RMLT + "ldesGenerateImmutableIRI"
LDES_TIMESTAMP_PATH = LDES + "timestampPath"
LDES_VERSION_OF_PATH = LDES + "versionOfPath"
LDES_EVENT_STREAM = LDES + "EventStream"
TREE_SHAPE = TREE + "shape"
TREE_MEMBER = TREE + "member"
VOID_DATA_DUMP = VOID + "dataDump"
VOID_DATASET = VOID + "Dataset"
DCT_MODIFIED = DCT + "modified"
DCT_IS_VERSION_OF = DCT + "isVersionOf"

# activity-streams lifecycle tags (src/voc.ts:117-122)
AS_CREATE = AS + "Create"
AS_UPDATE = AS + "Update"
AS_DELETE = AS + "Delete"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATETIME = XSD + "dateTime"

PREFIXES = {
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "rr": RR,
    "rml": RML,
    "ql": QL,
    "fnml": FNML,
    "fno": FNO,
    "idlab-fn": IDLAB_FN,
    "grel": GREL,
    "rmlt": RMLT,
    "ldes": LDES,
    "tree": TREE,
    "void": VOID,
    "dct": DCT,
    "as": AS,
    "formats": FORMATS,
    "csvw": CSVW,
    "rmls": RMLS,
    "d2rq": D2RQ,
    "td": TD,
    "hctl": HCTL,
    "ex": "http://example.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",  # ubiquitous in the official RML test cases
}

STANDARD_PREFIX_HEADER = "\n".join(f"@prefix {p}: <{iri}> ." for p, iri in PREFIXES.items())
