"""Reference-bridge SPARQL battery — every runtime SPARQL template the
reference's bridge layer issues (kgraph_bridge_utilities.py:161,320,367,
407,498,713,773; kgraph_chat_bridge.py:219,251; kgraph_frame_bridge.py:
289,528; kgraph_interaction_bridge.py:476), instantiated verbatim with
sample placeholder values and executed through our SPARQL front-end over
a synthetic store graph shaped like the bridges' own data model.

test_sparql.py covers the WordNet *test battery*; this file covers the
*production* query surface — the strings a reference user's running
system actually sends — so switching engines means these exact strings
keep working.
"""

import pytest

from kgraphmemory_spark.sparql import SparqlEngine

KG = "http://vital.ai/ontology/haley-ai-kg#"
VC = "http://vital.ai/ontology/vital-core#"
AIMP = "http://vital.ai/ontology/vital-aimp#"
RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
G = "urn:g"

SCHEMA = ("subject string, predicate string, object string, "
          "obj_datatype string, obj_lang string, graph string")


def _t(s, p, o, dt=None):
    return (s, p, o, dt, None, G)


def _rows():
    rows = [
        # kg:-namespaced edge (kgraph_bridge_utilities.py:161 traverses
        # kg:hasEdgeSource/Destination; the vc: twins below are for :320)
        _t("urn:ke1", RT, KG + "Edge_hasKGSlot"),
        _t("urn:ke1", KG + "hasEdgeSource", "urn:A"),
        _t("urn:ke1", KG + "hasEdgeDestination", "urn:B"),
        # vc:-namespaced edge to a typed target (utilities:320)
        _t("urn:ve1", RT, KG + "Edge_hasEntity"),
        _t("urn:ve1", VC + "hasEdgeSource", "urn:A"),
        _t("urn:ve1", VC + "hasEdgeDestination", "urn:T"),
        _t("urn:T", RT, KG + "KGEntity"),
        _t("urn:T", VC + "hasName", "Alpha"),
        _t("urn:T2", RT, KG + "KGEntity"),
        _t("urn:T2", VC + "hasName", "Beta"),
        # a plain document node whose properties utilities:407 dumps
        _t("urn:A", RT, KG + "KGDocument"),
        _t("urn:A", VC + "hasName", "DocA"),
        # chat: interaction --Edge_hasKGChatMessage--> messages
        _t("urn:int1", RT, KG + "KGChatInteraction"),
        _t("urn:actor1", VC + "hasName", "Alice"),
        _t("urn:actor2", VC + "hasName", "Bot"),
    ]
    for i, (cls, content, ts, actor) in enumerate([
            ("KGChatUserMessage", "hi", "2024-01-01T10:00:00",
             "urn:actor1"),
            ("KGChatBotMessage", "hello", "2024-01-01T10:00:05",
             "urn:actor2")]):
        m, e = f"urn:m{i}", f"urn:ce{i}"
        rows += [
            _t(e, RT, KG + "Edge_hasKGChatMessage"),
            _t(e, VC + "hasEdgeSource", "urn:int1"),
            _t(e, VC + "hasEdgeDestination", m),
            _t(m, RT, KG + cls),
            _t(m, KG + "hasKGChatMessageContent", content),
            _t(m, KG + "hasKGChatMessageType", "text"),
            _t(m, VC + "hasTimestamp", ts, XSD_DT),
            _t(m, KG + "hasKGChatMessageActor", actor),
            _t(m, KG + "hasKGChatInteractionURI", "urn:int1"),
        ]
    # frame --Edge_hasKGSlot--> slots (one entity slot, one text slot)
    rows += [
        _t("urn:f1", RT, KG + "KGFrame"),
        _t("urn:f1", VC + "hasName", "frame one"),
        _t("urn:f1", KG + "hasKGFrameType", "urn:ftype"),
        _t("urn:f1", KG + "hasKGFrameDescription", "a test frame"),
        _t("urn:fe1", RT, KG + "Edge_hasKGSlot"),
        _t("urn:fe1", VC + "hasEdgeSource", "urn:f1"),
        _t("urn:fe1", VC + "hasEdgeDestination", "urn:s1"),
        _t("urn:s1", RT, KG + "KGEntitySlot"),
        _t("urn:s1", VC + "hasName", "slot one"),
        _t("urn:s1", KG + "hasKGSlotType", "urn:hasSourceEntity"),
        _t("urn:s1", KG + "hasEntitySlotValue", "urn:ent1"),
        _t("urn:fe2", RT, KG + "Edge_hasKGSlot"),
        _t("urn:fe2", VC + "hasEdgeSource", "urn:f1"),
        _t("urn:fe2", VC + "hasEdgeDestination", "urn:s2"),
        _t("urn:s2", RT, KG + "KGTextSlot"),
        _t("urn:s2", VC + "hasName", "slot two"),
        _t("urn:s2", KG + "hasKGSlotTextValue", "some text"),
        # interactions for the date-filtered listing (interaction:476)
        _t("urn:int2", RT, KG + "KGInteraction"),
        _t("urn:int2", VC + "hasName", "session A"),
        _t("urn:int2", KG + "hasKGInteractionType", "chat"),
        _t("urn:int2", AIMP + "hasObjectUpdateTime",
           "2024-02-01T00:00:00", XSD_DT),
        _t("urn:int3", RT, KG + "KGInteraction"),
        _t("urn:int3", VC + "hasName", "session B"),
        _t("urn:int3", KG + "hasKGInteractionType", "chat"),
        _t("urn:int3", AIMP + "hasObjectUpdateTime",
           "2024-03-01T00:00:00", XSD_DT),
    ]
    return rows


@pytest.fixture(scope="module")
def eng(spark):
    return SparqlEngine(spark.createDataFrame(_rows(), SCHEMA))


def test_find_edge_by_type_source_dest(eng):
    # kgraph_bridge_utilities.py:161 (delete_edge lookup), verbatim
    rows = eng.query("""
            PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>

            SELECT ?edge WHERE {
                ?edge a kg:Edge_hasKGSlot ;
                      kg:hasEdgeSource <urn:A> ;
                      kg:hasEdgeDestination <urn:B> .
            }
            """).collect()
    assert [r.edge for r in rows] == ["urn:ke1"]


def test_graph_traversal_variable_predicates(eng):
    # kgraph_bridge_utilities.py:320 (get_connected_objects), verbatim
    # with graph_uri=urn:g, source_uri=urn:A, target_type=KGEntity and
    # the optional {edge_filter} placeholder empty
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

        SELECT ?target WHERE {
            GRAPH <urn:g> {
                ?edge ?sourceProp <urn:A> ;
                      ?destProp ?target .
                ?target a kg:KGEntity .

                FILTER(STRSTARTS(STR(?sourceProp), "http://vital.ai/ontology/vital-core#hasEdgeSource") ||
                       STRSTARTS(STR(?sourceProp), "http://vital.ai/ontology/vital-core#hasEdgeDestination"))
                FILTER(STRSTARTS(STR(?destProp), "http://vital.ai/ontology/vital-core#hasEdgeSource") ||
                       STRSTARTS(STR(?destProp), "http://vital.ai/ontology/vital-core#hasEdgeDestination"))
                FILTER(?sourceProp != ?destProp)
            }
        }
        """).collect()
    # urn:ke1's kg:hasEdgeSource arm must be rejected by the vc: filter
    assert [r.target for r in rows] == ["urn:T"]


def test_objects_by_type_in_graph(eng):
    # kgraph_bridge_utilities.py:367 (list_objects), verbatim
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

        SELECT ?object WHERE {
            GRAPH <urn:g> {
                ?object rdf:type kg:KGEntity .
            }
        }
        LIMIT 10
        """).collect()
    assert sorted(r.object for r in rows) == ["urn:T", "urn:T2"]


def test_object_properties_dump(eng):
    # kgraph_bridge_utilities.py:407 (get_object_properties), verbatim
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

        SELECT ?property ?value WHERE {
            <urn:A> ?property ?value .
        }
        """).collect()
    got = {(r.property, r.value) for r in rows}
    assert got == {(RT, KG + "KGDocument"), (VC + "hasName", "DocA")}


def test_edges_touching_object_union(eng):
    # kgraph_bridge_utilities.py:498 (find_edges_for_object).  The
    # reference renders `WHERE { A } UNION { B }` — not valid SPARQL
    # grammar (UNION must sit inside the group; pyoxigraph rejects it
    # too, so that reference code path errors upstream as written).
    # Battery runs the evident intent with the braces where the grammar
    # puts them.
    rows = eng.query("""
            PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>

            SELECT ?edge WHERE {
              {
                ?edge a ?edgeType ;
                      ?sourceProp <urn:A> .
                FILTER(STRSTARTS(STR(?edgeType), "http://vital.ai/ontology/haley-ai-kg#Edge_"))
              }
              UNION
              {
                ?edge a ?edgeType ;
                      ?destProp <urn:A> .
                FILTER(STRSTARTS(STR(?edgeType), "http://vital.ai/ontology/haley-ai-kg#Edge_"))
              }
            }
            """).collect()
    assert sorted({r.edge for r in rows}) == ["urn:ke1", "urn:ve1"]


def test_find_by_property_value(eng):
    # kgraph_bridge_utilities.py:713 (find_objects_by_property), verbatim
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

        SELECT ?object WHERE {
            GRAPH <urn:g> {
                ?object a kg:KGEntity ;
                        vital-core:hasName "Alpha" .
            }
        }
        LIMIT 10
        """).collect()
    assert [r.object for r in rows] == ["urn:T"]


def test_type_lookup_limit_one(eng):
    # kgraph_bridge_utilities.py:773 (get_object_type), verbatim
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>

        SELECT ?type WHERE {
            <urn:T> a ?type .
            FILTER(STRSTARTS(STR(?type), "http://vital.ai/ontology/haley-ai-kg#"))
        }
        LIMIT 1
        """).collect()
    assert [r.type for r in rows] == [KG + "KGEntity"]


def test_chat_edge_traversal(eng):
    # kgraph_chat_bridge.py:219 (get_messages, edge traversal), verbatim
    # — inline # comments, anchored-subject pattern, five OPTIONALs
    rows = eng.query("""
            PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
            PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

            SELECT ?message ?messageClass ?content ?type ?timestamp ?actor ?actorName
            WHERE {
                # Start from interaction and traverse via edges to messages
                <urn:int1> a kg:KGChatInteraction .

                # Find edges connecting interaction to messages
                ?edge a kg:Edge_hasKGChatMessage .
                ?edge vital-core:hasEdgeSource <urn:int1> .
                ?edge vital-core:hasEdgeDestination ?message .

                # Message properties
                ?message a ?messageClass .
                OPTIONAL { ?message kg:hasKGChatMessageContent ?content }
                OPTIONAL { ?message kg:hasKGChatMessageType ?type }
                OPTIONAL { ?message vital-core:hasTimestamp ?timestamp }
                OPTIONAL { ?message kg:hasKGChatMessageActor ?actor }

                # Actor details
                OPTIONAL {
                    ?actor vital-core:hasName ?actorName
                }

                FILTER(?messageClass = kg:KGChatUserMessage || ?messageClass = kg:KGChatBotMessage)
            }
            ORDER BY ?timestamp
            """).collect()
    assert [(r.message, r.content, r.actorName) for r in rows] == [
        ("urn:m0", "hi", "Alice"), ("urn:m1", "hello", "Bot")]


def test_chat_property_traversal(eng):
    # kgraph_chat_bridge.py:251 (get_messages, property traversal),
    # verbatim — required ; list plus IRI-valued property link
    rows = eng.query("""
            PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
            PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

            SELECT ?message ?messageClass ?content ?type ?timestamp ?actor ?actorName
            WHERE {
                ?message a ?messageClass ;
                         kg:hasKGChatMessageContent ?content ;
                         kg:hasKGChatMessageType ?type ;
                         vital-core:hasTimestamp ?timestamp .

                # Link to interaction via property
                ?message kg:hasKGChatInteractionURI <urn:int1> .

                # Optional actor information
                OPTIONAL { ?message kg:hasKGChatMessageActor ?actor }
                OPTIONAL {
                    ?actor vital-core:hasName ?actorName
                }

                FILTER(?messageClass = kg:KGChatUserMessage || ?messageClass = kg:KGChatBotMessage)
            }
            ORDER BY ?timestamp
            """).collect()
    assert [(r.message, r.messageClass) for r in rows] == [
        ("urn:m0", KG + "KGChatUserMessage"),
        ("urn:m1", KG + "KGChatBotMessage")]


def test_frame_full_reconstruct(eng):
    # kgraph_frame_bridge.py:289 (get_frame_with_slots), verbatim —
    # BIND(<iri> AS ?var) plus slot patterns nested two OPTIONALs deep
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

        SELECT ?frame ?frameName ?frameType ?frameDescription
               ?slot ?slotName ?slotType ?slotClass
               ?textValue ?entityValue ?datetimeValue ?booleanValue
        WHERE {
            # Frame properties
            <urn:f1> a kg:KGFrame .
            BIND(<urn:f1> AS ?frame)
            OPTIONAL { ?frame vital-core:hasName ?frameName }
            OPTIONAL { ?frame kg:hasKGFrameType ?frameType }
            OPTIONAL { ?frame kg:hasKGFrameDescription ?frameDescription }

            # Slots connected to this frame via edges
            OPTIONAL {
                ?edge a kg:Edge_hasKGSlot .
                ?edge vital-core:hasEdgeSource ?frame .
                ?edge vital-core:hasEdgeDestination ?slot .

                # Slot properties
                ?slot a ?slotClass .
                OPTIONAL { ?slot vital-core:hasName ?slotName }
                OPTIONAL { ?slot kg:hasKGSlotType ?slotType }

                # Slot values based on type
                OPTIONAL { ?slot kg:hasKGSlotTextValue ?textValue }
                OPTIONAL { ?slot kg:hasEntitySlotValue ?entityValue }
                OPTIONAL { ?slot kg:hasKGSlotDateTimeValue ?datetimeValue }
                OPTIONAL { ?slot kg:hasKGSlotBooleanValue ?booleanValue }
            }
        }
        ORDER BY ?slotName
        """).collect()
    assert [(r.frame, r.frameName, r.slot, r.slotClass,
             r.entityValue, r.textValue) for r in rows] == [
        ("urn:f1", "frame one", "urn:s1", KG + "KGEntitySlot",
         "urn:ent1", None),
        ("urn:f1", "frame one", "urn:s2", KG + "KGTextSlot",
         None, "some text")]


def test_frames_referencing_entity(eng):
    # kgraph_frame_bridge.py:528 (find_frames_for_entity), verbatim
    rows = eng.query("""
        PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
        PREFIX vital-core: <http://vital.ai/ontology/vital-core#>

        SELECT DISTINCT ?frame ?frameName ?frameType
        WHERE {
            ?frame a kg:KGFrame .
            OPTIONAL { ?frame vital-core:hasName ?frameName }
            OPTIONAL { ?frame kg:hasKGFrameType ?frameType }

            # Find slots in this frame that reference the entity
            ?edge a kg:Edge_hasKGSlot .
            ?edge vital-core:hasEdgeSource ?frame .
            ?edge vital-core:hasEdgeDestination ?slot .
            ?slot a kg:KGEntitySlot .
            ?slot kg:hasEntitySlotValue <urn:ent1> .
        }
        """).collect()
    assert [(r.frame, r.frameName, r.frameType) for r in rows] == [
        ("urn:f1", "frame one", "urn:ftype")]


def test_interaction_listing_with_date_filter(eng):
    # kgraph_interaction_bridge.py:476-499 (list_interactions), verbatim
    # including the appended date/type FILTER lines, DESC order + LIMIT
    rows = eng.query("""
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            SELECT ?interaction ?name ?type ?updateTime WHERE {
                GRAPH <urn:g> {
                    ?interaction a <http://vital.ai/ontology/haley-ai-kg#KGInteraction> .
                    ?interaction <http://vital.ai/ontology/vital-core#hasName> ?name .
                    OPTIONAL { ?interaction <http://vital.ai/ontology/haley-ai-kg#hasKGInteractionType> ?type }
                    OPTIONAL { ?interaction <http://vital.ai/ontology/vital-aimp#hasObjectUpdateTime> ?updateTime }
                }
                FILTER (?updateTime >= "2024-02-15T00:00:00"^^xsd:dateTime)
                FILTER (?type = "chat")
            }
            ORDER BY DESC(?updateTime)
            LIMIT 10
            """).collect()
    assert [(r.interaction, r.name) for r in rows] == [
        ("urn:int3", "session B")]


def test_hybrid_search_ask_filter(eng):
    # kgraph.py:328-335 (hybrid_search per-candidate ASK), verbatim —
    # no WHERE keyword, GRAPH group, caller-supplied {sparql_filter}
    # spliced in beside the anchor pattern
    def ask(uri, flt):
        return eng.ask(f"""
            PREFIX kg: <http://vital.ai/ontology/haley-ai-kg#>
            ASK {{
                GRAPH <urn:g> {{
                    <{uri}> ?p ?o .
                    {flt}
                }}
            }}
            """)
    assert ask("urn:T", "<urn:T> a kg:KGEntity .") is True
    assert ask("urn:A", "<urn:A> a kg:KGEntity .") is False
    assert ask("urn:T", "") is True              # no filter: any triple


def test_interaction_listing_unfiltered_desc(eng):
    # same template, no appended filters: both interactions, newest first
    rows = eng.query("""
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            SELECT ?interaction ?name ?type ?updateTime WHERE {
                GRAPH <urn:g> {
                    ?interaction a <http://vital.ai/ontology/haley-ai-kg#KGInteraction> .
                    ?interaction <http://vital.ai/ontology/vital-core#hasName> ?name .
                    OPTIONAL { ?interaction <http://vital.ai/ontology/haley-ai-kg#hasKGInteractionType> ?type }
                    OPTIONAL { ?interaction <http://vital.ai/ontology/vital-aimp#hasObjectUpdateTime> ?updateTime }
                }
            }
            ORDER BY DESC(?updateTime)
            LIMIT 10
            """).collect()
    assert [r.interaction for r in rows] == ["urn:int3", "urn:int2"]
