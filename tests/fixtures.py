"""Shared mapping/document fixtures recast from the reference tests
(/root/reference/test/rml.test.ts, test/incrml.test.ts) — see FIXTURES.md."""

XML_DOC = """<resource>
    <data id="001" label="some data"></data>
    <data id="002" label="some other data"></data>
</resource>"""

XML_DOC_V2 = """<resource>
    <data id="001" label="some new data"></data>
    <data id="002" label="some other new data"></data>
</resource>"""

XML_DOC_V3_DROPPED = """<resource>
    <data id="001" label="some new data"></data>
</resource>"""

# ≙ RML_TM_LOCAL_SOURCE_AND_NO_TARGET (/root/reference/test/rml.test.ts:140-183)
RML_BASIC = """
ex:map_test-mapping_000 a rr:TriplesMap ;
    rdfs:label "test-mapping" ;
    rml:logicalSource [
        a rml:LogicalSource ;
        rml:source "{source}" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath
    ] ;
    rr:subjectMap [
        a rr:SubjectMap ;
        rr:template "http://example.org/{{@id}}" ;
        rr:graphMap [ a rr:GraphMap ; rr:constant "http://example.org/myNamedGraph" ]
    ] ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicateMap [ a rr:PredicateMap ; rr:constant "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" ] ;
        rr:objectMap [ a rr:ObjectMap ; rr:constant <http://example.org/Entity> ; rr:termType rr:IRI ]
    ] ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicateMap [ a rr:PredicateMap ; rr:constant rdfs:label ] ;
        rr:objectMap [ a rr:ObjectMap ; rml:reference "@label" ; rr:termType rr:Literal ]
    ] .
"""

# ≙ RML_TM_LOCAL_SOURCE_AND_LDES_TARGET (/root/reference/test/rml.test.ts:84-138)
RML_LDES = """
ex:map_test-mapping_000 a rr:TriplesMap ;
    rdfs:label "test-mapping" ;
    rml:logicalSource [
        a rml:LogicalSource ;
        rml:source "{source}" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath
    ] ;
    rr:subjectMap [
        a rr:SubjectMap ;
        rr:template "http://example.org/{{@id}}" ;
        rml:logicalTarget [
            a rmlt:EventStreamTarget ;
            rmlt:serialization formats:N-Quads ;
            rmlt:target [ a void:Dataset ; void:dataDump <file:///results/output.nq> ] ;
            rmlt:ldes [ a ldes:EvenStream ; ldes:timestampPath dct:modified ; ldes:versionOfPath dct:isVersionOf ] ;
            rmlt:ldesGenerateImmutableIRI "true"^^xsd:boolean
        ] ;
        rr:graphMap [ a rr:GraphMap ; rr:constant "http://example.org/myNamedGraph" ]
    ] ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicateMap [ a rr:PredicateMap ; rr:constant "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" ] ;
        rr:objectMap [ a rr:ObjectMap ; rr:constant <http://example.org/Entity> ; rr:termType rr:IRI ]
    ] ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicateMap [ a rr:PredicateMap ; rr:constant rdfs:label ] ;
        rr:objectMap [ a rr:ObjectMap ; rml:reference "@label" ; rr:termType rr:Literal ]
    ] .
"""

# ≙ RML_TM_STATEFUL (/root/reference/test/rml.test.ts:185-297)
RML_STATEFUL = """
ex:logical_source a rml:LogicalSource ;
    rml:source "{source}" ;
    rml:iterator "//data" ;
    rml:referenceFormulation ql:XPath .

ex:map_test-mapping_000 a rr:TriplesMap ;
    rdfs:label "test-mapping-create" ;
    rml:logicalSource ex:logical_source ;
    rr:subjectMap [
        fnml:functionValue [
            rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:explicitCreate ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:iri ; rr:objectMap [ rr:template "http://example.org/{{@id}}" ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:state ; rr:objectMap [ rr:constant "/tmp/create_state" ; rr:dataType xsd:string ; ] ] ;
        ] ;
        rr:class <http://example.org/Entity> ;
    ] ;
    rr:predicateObjectMap ex:pom_001 ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicate ex:lifeCycleType ;
        rr:objectMap [ a rr:ObjectMap ; rr:constant as:Create ; rr:termType rr:IRI ]
    ] .

ex:map_test-mapping_001 a rr:TriplesMap ;
    rdfs:label "test-mapping-update" ;
    rml:logicalSource ex:logical_source ;
    rr:subjectMap [
        fnml:functionValue [
            rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:implicitUpdate ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:iri ; rr:objectMap [ rr:template "http://example.org/{{@id}}" ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:watchedProperty ; rr:objectMap [ rml:reference "('prop0=' || @id || 'prop1=' || @label)" ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:state ; rr:objectMap [ rr:constant "/tmp/update_state" ; rr:dataType xsd:string ; ] ] ;
        ] ;
        rr:class <http://example.org/Entity> ;
    ] ;
    rr:predicateObjectMap ex:pom_001 ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicate ex:lifeCycleType ;
        rr:objectMap [ a rr:ObjectMap ; rr:constant as:Update ; rr:termType rr:IRI ]
    ] .

ex:map_test-mapping_002 a rr:TriplesMap ;
    rdfs:label "test-mapping-delete" ;
    rml:logicalSource ex:logical_source ;
    rr:subjectMap [
        fnml:functionValue [
            rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:implicitDelete ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:iri ; rr:objectMap [ rr:template "http://example.org/{{@id}}" ] ] ;
            rr:predicateObjectMap [ rr:predicate idlab-fn:state ; rr:objectMap [ rr:constant "/tmp/delete_state" ; rr:dataType xsd:string ; ] ] ;
        ] ;
        rr:class <http://example.org/Entity> ;
    ] ;
    rr:predicateObjectMap [
        a rr:PredicateObjectMap ;
        rr:predicate ex:lifeCycleType ;
        rr:objectMap [ a rr:ObjectMap ; rr:constant as:Delete ; rr:termType rr:IRI ]
    ] .

ex:pom_001 a rr:PredicateObjectMap ;
    rr:predicateMap [ a rr:PredicateMap ; rr:constant rdfs:label ] ;
    rr:objectMap [ a rr:ObjectMap ; rml:reference "@label" ; rr:termType rr:Literal ] .
"""

JSON_DOC = """[
  {"id": "101", "name": "Station A", "bikes_available": 7},
  {"id": "102", "name": "Station B", "bikes_available": 0}
]"""

# ≙ blue-bike mapping shape (/root/reference/test/rml.test.ts:299-350)
RML_JSON = """
ex:map_stations a rr:TriplesMap ;
    rml:logicalSource [
        a rml:LogicalSource ;
        rml:source "{source}" ;
        rml:iterator "$.[*]" ;
        rml:referenceFormulation ql:JSONPath
    ] ;
    rr:subjectMap [
        a rr:SubjectMap ;
        rr:template "https://blue-bike.be/stations/{{id}}" ;
        rr:class <http://example.org/BicycleParkingStation>
    ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://example.org/name> ] ;
        rr:objectMap [ rml:reference "name" ; rr:datatype xsd:string ]
    ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://example.org/availableBikes> ] ;
        rr:objectMap [ rml:reference "bikes_available" ; rr:datatype xsd:integer ]
    ] .
"""

# ≙ POM_JOIN fixture (/root/reference/test/incrml.test.ts:136-177)
RML_JOIN = """
ex:parent_map a rr:TriplesMap ;
    rml:logicalSource [
        a rml:LogicalSource ;
        rml:source "{parent_source}" ;
        rml:iterator "//Data" ;
        rml:referenceFormulation ql:XPath
    ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://ex.org/parent/{{@id}}" ] .

ex:child_map a rr:TriplesMap ;
    rml:logicalSource [
        a rml:LogicalSource ;
        rml:source "{child_source}" ;
        rml:iterator "//Data" ;
        rml:referenceFormulation ql:XPath
    ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://ex.org/child/{{@id}}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://ex.org/ns/joinProperty> ] ;
        rr:objectMap [
            a rr:ObjectMap ;
            rr:parentTriplesMap ex:parent_map ;
            rml:joinCondition [
                a fnml:FunctionTermMap ;
                fnml:functionValue [
                    rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:equal ; rr:termType rr:IRI ] ] ;
                    rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "Property/@Value" ; rr:termType rr:Literal ] ] ;
                    rr:predicateObjectMap [ rr:predicate grel:valueParameter2 ; rr:objectMap [ rr:parentTermMap [ rml:reference "Property1/@Value" ] ] ]
                ]
            ]
        ]
    ] .
"""
