"""Model definitions: YOLOv5-style graph, UNet mask head, DBNet line head."""
