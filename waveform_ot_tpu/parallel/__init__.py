"""(populated in later milestones)"""
