from tvretrieval_tpu.models.xml import XML, XMLConfig

__all__ = ["XML", "XMLConfig"]
