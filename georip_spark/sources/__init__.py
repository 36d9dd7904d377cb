"""Sources and sinks (SURVEY.md §2.1): CSV labels, COCO JSON,
PascalVOC XML, YOLO label files, YAML manifest."""
