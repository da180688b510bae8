from raycdc.pipelines.curation import curate_documents

__all__ = ["curate_documents"]
