"""Pipeline configuration.

The reference hard-codes document-class constants (SURVEY.md §4 P12):
1047 max page (toc_parser.py:250), TOC scan limited to pages <= 60
(main.py:201), metadata limited to pages 1-5 (metadata_parser.py:98).
Here they are explicit parameters whose defaults pin the reference values
so the oracle fixtures reproduce reference behavior bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- document-class constants (reference parity defaults) ---
    #: TOC candidate pages: reference main.py:194-202 keeps page <= 60.
    toc_max_page: int = 60
    #: metadata scan pages 1..5: reference metadata_parser.py:98.
    metadata_max_page: int = 5
    #: hard page-count upper bound used by quality filters
    #: (reference toc_parser.py:250, 443 — 1047 for the USB-PD doc).
    max_valid_page: int = 1047
    #: final sanity page range (reference toc_parser.py:684-691).
    absolute_max_page: int = 9999
    #: fallback confidence threshold (reference toc_parser.py:626).
    fallback_confidence: float = 0.6
    #: default document title (reference toc_parser.py:26, main.py:209).
    default_doc_title: str = "USB Power Delivery Specification"
    #: doc-title fallback used when metadata step fails (main.py:204-210).
    metadata_doc_title_fallback: str = (
        "Universal Serial Bus Power Delivery Specification"
    )
    #: JSONL poison-pill guard: skip lines > 1M chars (helpers.py:29).
    max_line_length: int = 1_000_000
    #: substantial-content threshold (section_parser.py:252-254).
    substantial_content_len: int = 100
    #: paragraph filter threshold (section_parser.py:279-283).
    paragraph_min_len: int = 50

    # --- scale knobs (no reference analog; Spark-side) ---
    #: shuffle partitions for local testing; production uses AQE + larger.
    shuffle_partitions: int = 32
    #: spans above this count per doc are salted for two-phase reassembly.
    mega_doc_span_threshold: int = 100_000
    #: number of salt buckets for mega-doc two-phase reassembly.
    salt_buckets: int = 16
    #: apply the two-phase mega-doc W2 path in run_pipeline (operators/
    #: pages.span_sequence_skew_df); False keeps the bare single-window
    #: plan (no mega-detection pass) for corpora known to be bounded.
    mega_doc_salting: bool = True

    # --- span-kind vocabulary (SURVEY.md §1.4) ---
    text_kinds: tuple = ("text", "heading")
    table_kinds: tuple = ("table",)
    image_kinds: tuple = ("image", "figure")
    layout_kinds: tuple = ("layout_line",)
    annotation_kinds: tuple = ("annotation",)
    structural_kinds: tuple = ("page_break",)

    @property
    def known_kinds(self) -> tuple:
        return (
            self.text_kinds
            + self.table_kinds
            + self.image_kinds
            + self.layout_kinds
            + self.annotation_kinds
            + self.structural_kinds
        )


DEFAULT_CONFIG = PipelineConfig()
