from raycdc.pipelines.curation import curate_documents, curate_documents_v2

__all__ = ["curate_documents", "curate_documents_v2"]
