"""Shared test/demo fixtures — the reference's `sample_nodes.py` rebuilt.

18 hand-written `NodeInput` fixtures spanning products / documents /
specifications / categories across the relevant-to-irrelevant spectrum
(sample_nodes.py:5-171), with deterministic embeddings derived from the
fixture text (the reference uses `np.random.rand(384)`, which made scores
non-reproducible — flagged in SURVEY §7.4).
"""

from __future__ import annotations

from typing import List


from hcrag_tpu.core.types import NodeInput, QueryInput, QueryIntent
from hcrag_tpu.models.embedder import HashingEmbedder

_EMBEDDER = HashingEmbedder()

_FIXTURES = [
    # (text, node_type, entities)
    ("Premium Red Mountain Bike - Trail Blazer X1 with advanced suspension "
     "and lightweight frame, perfect for off-road adventures under $900",
     "product", ["red mountain bike", "trail", "suspension", "lightweight"]),
    ("Blue Mountain Bike - Rugged terrain specialist with 21-speed gear "
     "system, priced at $750",
     "product", ["blue mountain bike", "terrain", "gear system"]),
    ("Mountain Bike Maintenance Guide - Complete handbook for maintaining "
     "your mountain bike including brake adjustments, tire care, and gear "
     "tuning",
     "document", ["mountain bike", "maintenance", "brake", "tire"]),
    ("Red Road Bike - Speed demon for paved roads with aerodynamic design, "
     "$1200",
     "product", ["red road bike", "aerodynamic", "speed"]),
    ("Mountain Bike Frame Specifications - Technical details for aluminum "
     "and carbon fiber mountain bike frames, weight tolerances and geometry",
     "specification", ["mountain bike", "frame", "aluminum", "carbon fiber"]),
    ("Mountain Bikes Category - Off-road bicycles designed for rough "
     "terrain riding",
     "category", ["mountain bike", "off-road"]),
    ("Red Mountain Bike Helmet - Safety certified helmet with ventilation, "
     "matches red bikes, $85",
     "product", ["red", "helmet", "safety"]),
    ("Kitchen Blender 3000 - High-powered blender for smoothies and food "
     "preparation, $120",
     "product", ["blender", "kitchen"]),
    ("Office Chair Assembly Manual - Step-by-step guide for assembling "
     "ergonomic office chairs",
     "document", ["office chair", "assembly"]),
    ("Laptop Computer Specifications - 16GB RAM, 512GB SSD, 14-inch display "
     "technical specs",
     "specification", ["laptop", "computer"]),
    ("Mountain Bike Wheels 29-inch - Tubeless-ready wheels for mountain "
     "bikes, pair $320",
     "product", ["mountain bike", "wheel", "tubeless"]),
    ("Touring Bike Travel Guide - Long distance cycling routes and "
     "equipment recommendations",
     "document", ["touring bike", "travel"]),
    ("Bicycle Brake Pads Specification - Compatibility chart for disc and "
     "rim brake pads",
     "specification", ["brake", "bicycle"]),
    ("Garden Hose 50ft - Flexible watering hose for outdoor use, $35",
     "product", ["garden hose"]),
    ("Road Bikes Category - Lightweight bicycles optimized for paved "
     "surfaces",
     "category", ["road bike", "lightweight"]),
    ("Mountain Bike Suspension Service Manual - Fork and shock maintenance "
     "procedures with torque specifications",
     "document", ["mountain bike", "suspension", "fork"]),
    ("Black Mountain Bike Gloves - Padded cycling gloves size M-XL, $25",
     "product", ["black", "gloves", "mountain bike"]),
    ("Annotation: Mountain bike geometry diagram Figure 3",
     "annotation", ["mountain bike", "geometry"]),
]


def create_sample_nodes() -> List[NodeInput]:
    """18 typed fixture nodes with deterministic embeddings."""
    nodes = []
    for text, node_type, entities in _FIXTURES:
        nodes.append(
            NodeInput(
                text=text,
                embeddings=_EMBEDDER.encode([text])[0],
                graph_relations={"type": node_type},
                node_type=node_type,
                entities=entities,
            )
        )
    return nodes


def create_sample_query(
    text: str = "Find red mountain bikes under $1000",
    intent: QueryIntent = QueryIntent.PRODUCT_SEARCH,
) -> QueryInput:
    """The canonical demo query (isRelevant.py:172-179) with a real
    embedding."""
    return QueryInput(
        text=text,
        embeddings=_EMBEDDER.encode([text])[0],
        entities=["red mountain bike"],
        intent=intent,
    )
