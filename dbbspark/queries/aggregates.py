"""(populated in later build steps)"""
